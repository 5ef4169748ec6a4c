"""Headless renderer / camera / input tests (the mgf_demo render + input
layer equivalents: world.rs:296-392, input.rs:81-110, balls_vs/fs.glsl)."""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

from render import (  # noqa: E402
    Camera, Frame, apply_input, draw_spheres, draw_triangles, render_world,
    save_ppm, view_proj,
)


def test_camera_input_mapping():
    cam = Camera(pos=(0.0, 0.0, 0.0), yaw=0.0, pitch=0.0)
    # W moves along -z (forward); mouse x turns yaw
    cam2 = apply_input(cam, keys={"w"}, dt=1.0, speed=2.0)
    assert cam2.pos[2] < cam.pos[2] and cam2.pos[0] == 0.0
    cam3 = apply_input(cam, keys={"d"}, dt=1.0, speed=2.0)
    assert cam3.pos[0] > 0.0
    cam4 = apply_input(cam, mouse=(100.0, 0.0))
    assert cam4.yaw != 0.0
    # pitch clamps inside +-pi/2
    cam5 = apply_input(cam, mouse=(0.0, -1e6))
    assert abs(cam5.pitch) < math.pi / 2


def test_sphere_projection_and_depth():
    cam = Camera(pos=(0.0, 0.0, 10.0), yaw=0.0, pitch=0.0)
    f = Frame(128, 128)
    mvp = view_proj(cam, 128, 128)
    draw_spheres(f, mvp, [[0.0, 0.0, 0.0]], [1.0], color=(255, 0, 0))
    # center pixel red, corner untouched
    assert tuple(f.color[64, 64]) != tuple(f.color[0, 0])
    assert f.color[64, 64][0] > 100
    # nearer sphere wins the z-buffer
    draw_spheres(f, mvp, [[0.0, 0.0, 5.0]], [0.5], color=(0, 255, 0))
    assert f.color[64, 64][1] > f.color[64, 64][0]


def test_triangle_raster_and_ppm(tmp_path):
    cam = Camera(pos=(0.0, 0.0, 5.0), yaw=0.0, pitch=0.0)
    f = Frame(96, 96)
    mvp = view_proj(cam, 96, 96)
    verts = [[-2, -1, 0], [2, -1, 0], [0, 2, 0]]
    draw_triangles(f, mvp, verts, [[0, 1, 2]], color=(10, 200, 10))
    assert f.color[48, 48][1] == 200
    assert np.isfinite(f.depth[48, 48])
    p = str(tmp_path / "frame.ppm")
    save_ppm(p, f)
    with open(p, "rb") as fh:
        head = fh.read(15)
    assert head.startswith(b"P6\n96 96\n255\n")


def test_render_world_snapshot():
    from mgf_tpu.scenes import balls_scene
    w, cfg = balls_scene(num=2, with_dropped=False)
    f = render_world(w, width=160, height=120)
    # something was drawn over the background
    bg = f.color[0, 0].copy()
    assert (f.color != bg).any()

"""Function-slice imaging (reference: Octree::OutputFunctionSlice,
Source/HP/Octree.cpp:1131-1206)."""

import struct

import numpy as np
import pytest

import hpsdf_tpu as hp
from hpsdf_tpu import viz
from .util import sphere_sdf


@pytest.fixture(scope="module")
def tree():
    cfg = hp.Config(target_error=1e-6, continuity=False, max_depth=4,
                    max_degree=4)
    return hp.build_octree(cfg, sphere_sdf(radius=0.3))


def test_slice_values(tree):
    v = viz.function_slice(tree, z=0.0, resolution=65)
    # centre of image = origin: inside the sphere (negative)
    assert v[32, 32] < -0.25
    # corners: outside
    assert v[0, 0] > 0.1 and v[-1, -1] > 0.1


def test_slice_colors(tree):
    v = viz.function_slice(tree, z=0.0, resolution=65)
    rgb = viz.slice_to_rgb(v)
    assert rgb.shape == (65, 65, 3)
    # inside -> blue channel, outside -> green (reference: Octree.cpp:1163-1199)
    assert rgb[32, 32, 2] > 0 and rgb[32, 32, 1] == 0
    assert rgb[0, 0, 1] > 0 and rgb[0, 0, 2] == 0
    assert np.all(rgb[..., 0] == 0)


def test_bmp_roundtrip(tree, tmp_path):
    path = str(tmp_path / "slice.bmp")
    viz.output_function_slice(tree, path, z=0.0, resolution=64)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM"
    size = struct.unpack("<I", data[2:6])[0]
    assert size == len(data) == 54 + 64 * 64 * 3

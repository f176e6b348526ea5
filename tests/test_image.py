import numpy as np

from raytpu.image import max_colour_value, read_ppm, tone_map, write_ppm


def test_tone_map_clamp_before_scale():
    # The reference clamps to 1.0 BEFORE dividing by the max (main.cpp:71-76),
    # so a max above 1 darkens everything.
    img = np.asarray([[[2.0, 1.0, 0.5]]], np.float32)
    out = tone_map(img)  # max = 2.0
    # channel 0: min(1,2)*255/2 = 127.5 -> 127 (truncation)
    assert out.tolist() == [[[127, 127, 63]]]


def test_tone_map_nan_is_one():
    img = np.asarray([[[np.nan, 0.5, 1.0]]], np.float32)
    out = tone_map(img)  # NaN skipped by max scan -> max=1
    assert out.tolist() == [[[255, 127, 255]]]


def test_tone_map_small_max_rescales_up():
    img = np.asarray([[[1e-4, 5e-5, 0.0]]], np.float32)
    out = tone_map(img)
    assert out[0, 0, 0] == 255
    assert out[0, 0, 1] in (127, 128)
    assert out[0, 0, 2] == 0


def test_max_colour_value_guard():
    assert max_colour_value(np.zeros((2, 2, 3), np.float32)) == 1.0


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((7, 5, 3)).astype(np.float32)
    path = tmp_path / "x.ppm"
    write_ppm(img, path)
    back = read_ppm(path)
    assert back.shape == (7, 5, 3)
    np.testing.assert_array_equal(back, tone_map(img))


def test_read_reference_golden():
    g = read_ppm("/root/reference/raytracer_gamma/testPPM_CPU.ppm")
    assert g.shape == (600, 800, 3)

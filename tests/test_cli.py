"""CLI surface tests (tiny model, CPU): single-file and directory-batch modes."""

import numpy as np
import pytest
from PIL import Image

from sdmatte_tpu import cli


def _write_pair(img_path, tri_path, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                    ).save(img_path)
    tri = np.zeros((h, w), np.uint8)
    tri[h // 4: h // 2, w // 4: w // 2] = 128
    tri[h // 2:, w // 2:] = 255
    Image.fromarray(tri).save(tri_path)


def test_cli_single_image(tmp_path):
    img, tri = str(tmp_path / "in.png"), str(tmp_path / "tri.png")
    out, matted = str(tmp_path / "alpha.png"), str(tmp_path / "matted.png")
    _write_pair(img, tri)
    rc = cli.main(["--image", img, "--trimap", tri, "--out", out,
                   "--matted-out", matted, "--mode", "matted_rgba",
                   "--size", "512", "--tiny", "--cpu"])
    assert rc == 0
    alpha = np.asarray(Image.open(out))
    assert alpha.shape == (48, 64)          # back at the original resolution
    m = np.asarray(Image.open(matted))
    assert m.shape == (48, 64, 4)           # rgba composite


def test_cli_directory_batch(tmp_path):
    imgs, tris = tmp_path / "imgs", tmp_path / "tris"
    outs, matteds = tmp_path / "alphas", tmp_path / "matted"
    imgs.mkdir(), tris.mkdir()
    for i in range(3):                       # one same-shape group
        _write_pair(str(imgs / f"a{i}.png"), str(tris / f"a{i}.png"), seed=i)
    _write_pair(str(imgs / "wide.png"), str(tris / "wide.png"),
                h=32, w=80, seed=9)          # second shape group
    _write_pair(str(imgs / "orphan.png"), str(tmp_path / "unused.png"))
    rc = cli.main(["--image", str(imgs), "--trimap", str(tris),
                   "--out", str(outs), "--matted-out", str(matteds),
                   "--size", "512", "--batch", "2", "--tiny", "--cpu"])
    assert rc == 0
    got = sorted(p.name for p in outs.iterdir())
    assert got == ["a0.png", "a1.png", "a2.png", "wide.png"]  # orphan skipped
    assert np.asarray(Image.open(outs / "wide.png")).shape == (32, 80)
    assert sorted(p.name for p in matteds.iterdir()) == got


def test_cli_mixed_file_dir_errors(tmp_path):
    img, tri = str(tmp_path / "in.png"), str(tmp_path / "tri.png")
    _write_pair(img, tri)
    with pytest.raises(SystemExit):
        cli.main(["--image", str(tmp_path), "--trimap", tri,
                  "--out", str(tmp_path / "o.png"), "--tiny", "--cpu"])


def test_cli_stem_collision_skipped(tmp_path, capsys):
    """cat.png + cat.jpg both map to out/cat.png — only one may be paired."""
    imgs, tris = tmp_path / "imgs", tmp_path / "tris"
    imgs.mkdir(), tris.mkdir()
    _write_pair(str(imgs / "cat.png"), str(tris / "cat.png"))
    _write_pair(str(imgs / "cat.jpg"), str(tmp_path / "scratch.png"), seed=1)
    pairs = cli._pair_directory(str(imgs), str(tris))
    assert len(pairs) == 1
    assert pairs[0][0] == "cat"


def test_load_image_bit_depth_and_palette(tmp_path):
    """16-bit PNGs (the common matte/trimap export depth) must normalize by
    65535, not 255; palette images must resolve indices to colors."""
    p16 = str(tmp_path / "tri16.png")
    arr16 = np.zeros((8, 8), np.uint16)
    arr16[4:, 4:] = 65535                    # fg = 1.0
    arr16[:4, 4:] = 32768                    # unknown ~ 0.5
    Image.fromarray(arr16).save(p16)
    got = cli._load_image(p16, 1)[..., 0]
    assert got.max() <= 1.0 + 1e-6
    assert abs(got[7, 7] - 1.0) < 1e-6
    assert abs(got[0, 7] - 0.5) < 1e-3

    pal = str(tmp_path / "pal.png")
    img = Image.new("P", (8, 8))
    img.putpalette([0, 0, 0, 255, 0, 0] + [0] * (254 * 3))
    img.paste(1, (0, 0, 8, 8))               # every pixel = palette entry 1 (red)
    img.save(pal)
    rgb = cli._load_image(pal, 3)
    assert rgb.shape == (8, 8, 3)
    assert abs(rgb[0, 0, 0] - 1.0) < 1e-6    # red channel, not raw index 1/255
    assert rgb[0, 0, 1] == 0.0

    p8 = str(tmp_path / "tri8.png")          # 8-bit path unchanged
    Image.fromarray(np.full((4, 4), 128, np.uint8)).save(p8)
    assert abs(cli._load_image(p8, 1)[0, 0, 0] - 128 / 255.0) < 1e-6


def test_decoder_canonicalizes_every_mode(tmp_path):
    """Every PIL mode must land at exactly (H, W, 3) or (H, W, 1) in [0, 1]
    — the serve micro-batch key has no channel component, so a surprise
    channel count would fail np.stack for a whole coalesced batch."""
    from sdmatte_tpu.utils.images import pil_to_unit_array
    h, w = 5, 7
    modes = {
        "RGBA": Image.fromarray(
            np.full((h, w, 4), 200, np.uint8), "RGBA"),
        "LA": Image.fromarray(np.full((h, w, 2), 100, np.uint8), "LA"),
        "CMYK": Image.new("CMYK", (w, h), (10, 20, 30, 40)),
        "1": Image.new("1", (w, h), 1),
        "F": Image.fromarray(np.full((h, w), 0.25, np.float32), "F"),
        "I": Image.fromarray(np.full((h, w), 32768, np.int32), "I"),
    }
    for name, img in modes.items():
        for ch in (3, 1):
            arr = pil_to_unit_array(img, ch)
            assert arr.shape == (h, w, ch), (name, ch, arr.shape)
            assert arr.dtype == np.float32
            assert 0.0 <= float(arr.min()) and float(arr.max()) <= 1.0, name
    assert abs(float(pil_to_unit_array(modes["F"], 1)[0, 0, 0]) - 0.25) < 1e-6
    assert abs(float(pil_to_unit_array(modes["I"], 1)[0, 0, 0]) - 0.5) < 1e-3


def test_serve_png_decode_16bit_not_clipped(tmp_path):
    """The HTTP endpoint shares the bit-depth-aware decoder: a 16-bit
    trimap's 0.5-gray unknown band must stay 0.5, not clip to foreground
    (PIL convert('L') clips >8-bit samples at 255)."""
    import base64
    import io
    from sdmatte_tpu.api.serve import _png_to_array
    arr16 = np.full((6, 6), 32768, np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr16).save(buf, format="PNG")
    tri = _png_to_array(base64.b64encode(buf.getvalue()).decode(), 1)
    assert tri.shape == (6, 6, 1)
    assert abs(float(tri[0, 0, 0]) - 0.5) < 1e-3
    # 8-bit RGB request path unchanged: (H, W, 3) in [0, 1]
    buf = io.BytesIO()
    Image.fromarray(np.full((6, 6, 3), 128, np.uint8)).save(buf, format="PNG")
    img = _png_to_array(base64.b64encode(buf.getvalue()).decode(), 3)
    assert img.shape == (6, 6, 3)
    assert abs(float(img[0, 0, 0]) - 128 / 255.0) < 1e-6


def test_cli_point_prompt_requires_coords(tmp_path):
    img, tri = str(tmp_path / "in.png"), str(tmp_path / "tri.png")
    _write_pair(img, tri)
    with pytest.raises(SystemExit):
        cli.main(["--image", img, "--trimap", tri,
                  "--out", str(tmp_path / "o.png"),
                  "--prompt-type", "point_mask", "--tiny", "--cpu"])
    with pytest.raises(SystemExit):           # malformed coords -> clean error
        cli.main(["--image", img, "--trimap", tri,
                  "--out", str(tmp_path / "o.png"),
                  "--coords", "0.1,oops", "--tiny", "--cpu"])


def test_cli_batch_must_be_positive(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["--image", "x", "--trimap", "y", "--out", "z",
                  "--batch", "0", "--tiny", "--cpu"])


def test_cli_directory_remainder_pads_to_reuse_graph(tmp_path):
    """A remainder chunk must reuse an already-compiled batch size instead
    of compiling a new heavy graph (3 images at --batch 2 -> chunks 2 and
    1->padded-to-2 -> ONE heavy trace)."""
    import argparse
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions

    imgs, tris, outs = tmp_path / "imgs", tmp_path / "tris", tmp_path / "out"
    imgs.mkdir(), tris.mkdir()
    for i in range(3):
        _write_pair(str(imgs / f"x{i}.png"), str(tris / f"x{i}.png"), seed=i)

    cfg = SDMatteConfig.tiny()
    pipe = MattingPipeline(sdmatte.init(cfg, seed=0), cfg, attn_impl="xla")
    args = argparse.Namespace(image=str(imgs), trimap=str(tris),
                              out=str(outs), matted_out=None, batch=2)
    opts = PipelineOptions(inference_size=64, mask_refine=True)
    rc = cli._run_directory(pipe, args, opts, None)
    assert rc == 0
    assert sorted(p.name for p in outs.iterdir()) == \
        ["x0.png", "x1.png", "x2.png"]
    assert pipe._trace_counts["heavy"] == 1   # remainder reused the b=2 graph

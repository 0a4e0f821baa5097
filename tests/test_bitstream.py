"""Full serialize -> bytes -> deserialize -> render round trip."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.compress import (
    QuantConfig,
    compress_wo_ec,
    decompress_wo_ec,
    init_quantizers,
)
from gaussianimage_plus_tpu.compress.bitstream import (
    decode_bitstream,
    deserialize_bitstream,
    serialize_bitstream,
)
from gaussianimage_plus_tpu.models import GaussianConfig, init_state
from gaussianimage_plus_tpu.train import TrainConfig
from gaussianimage_plus_tpu.train.trainer import init_train_state, train_chunk


def fitted(qcfg, H=32, W=48, M=64, n=48, steps=60):
    cfg = GaussianConfig(H=H, W=W, max_num_points=M, tile_cap=32)
    tcfg = TrainConfig(iterations=100, grow_iter=50, prune_iter=50, lr=0.05)
    gt = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (cfg.H, cfg.W, 3)).astype(np.float32))
    ts = init_train_state(cfg, tcfg, n, seed=2)
    ts, _ = train_chunk(ts, gt, cfg, tcfg, steps, True, False)
    state = ts.gaussians
    bundle = init_quantizers(state, cfg, qcfg)
    enc = compress_wo_ec(bundle, state, cfg, qcfg)
    return cfg, state, bundle, enc


@pytest.mark.parametrize("qcfg", [
    QuantConfig(decode_cap=32),
    QuantConfig(xy_quant="fp16", decode_cap=32),
    QuantConfig(color_quant="vq", decode_cap=32),
], ids=["lsq", "fp16-xy", "vq-color"])
def test_round_trip_renders_identically(qcfg):
    cfg, state, bundle, enc = fitted(qcfg)
    data = serialize_bitstream(bundle, enc, cfg, qcfg)
    assert isinstance(data, bytes) and len(data) > 64

    img_direct = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
    img_rt, dec = decode_bitstream(data)
    assert dec.H == cfg.H and dec.W == cfg.W
    # codes survive the byte round trip exactly, so the render is the same
    # computation on the same values (only the padded M differs)
    np.testing.assert_allclose(np.asarray(img_rt), np.asarray(img_direct),
                               atol=1e-5)
    # reported rate is the real artifact size
    assert dec.bpp == pytest.approx(len(data) * 8 / (cfg.H * cfg.W))


def test_codes_recovered_exactly():
    qcfg = QuantConfig(decode_cap=32)
    cfg, state, bundle, enc = fitted(qcfg)
    data = serialize_bitstream(bundle, enc, cfg, qcfg)
    dec = deserialize_bitstream(data)
    active = np.asarray(enc.active).astype(bool)
    n = int(active.sum())
    np.testing.assert_array_equal(
        np.asarray(dec.enc.quant_cov)[:n], np.asarray(enc.quant_cov)[active])
    np.testing.assert_array_equal(
        np.asarray(dec.enc.quant_means)[:n], np.asarray(enc.quant_means)[active])
    np.testing.assert_array_equal(
        np.asarray(dec.enc.color_codes)[:n], np.asarray(enc.color_codes)[active])
    assert int(dec.enc.num_active) == n
    # grids survive too
    np.testing.assert_allclose(np.asarray(dec.bundle.xy.scale),
                               np.asarray(bundle.xy.scale), rtol=1e-7)
    np.testing.assert_allclose(float(dec.enc.log_state.scale),
                               float(enc.log_state.scale), rtol=1e-7)


def test_bitstream_near_fixed_width_rate():
    """The real artifact (rANS cov/color + bit-packed xy + side tables +
    grids) should land near the bit-width accounting at a realistic-ish
    point count — entropy coding pays for its tables once codes repeat."""
    from gaussianimage_plus_tpu.compress import analysis_wo_ec

    qcfg = QuantConfig(decode_cap=32)
    cfg, state, bundle, enc = fitted(qcfg, H=64, W=96, M=512, n=400, steps=90)
    data = serialize_bitstream(bundle, enc, cfg, qcfg)
    stats = analysis_wo_ec(enc, cfg, qcfg, bundle)
    # v2 gaussian streams ship their u16 counts table (cross-platform
    # decodability) — allow that fixed cost on top of the bit-width
    # accounting; it amortizes at real point counts
    table_bits = 2 * (1 << 10) * 16   # two streams, <=2^10 support, u16
    assert len(data) * 8 < stats["bpp"] * cfg.H * cfg.W * 1.15 + table_bits


def test_file_round_trip(tmp_path):
    qcfg = QuantConfig(decode_cap=32)
    cfg, state, bundle, enc = fitted(qcfg)
    p = tmp_path / "img.gipb"
    p.write_bytes(serialize_bitstream(bundle, enc, cfg, qcfg))
    img, dec = decode_bitstream(p.read_bytes())
    assert img.shape == (cfg.H, cfg.W, 3)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0


def test_rejects_garbage():
    with pytest.raises(ValueError):
        deserialize_bitstream(b"NOPE" + b"\x00" * 64)


def test_truncation_fuzz_raises_not_crashes():
    """Every truncation of a valid artifact must raise a Python error
    (ValueError from validation, or struct/IndexError at the fixed header) —
    never reach the native rANS decoder with inconsistent sizes (ADVICE r2
    medium: malformed .gipb input)."""
    qcfg = QuantConfig(decode_cap=32)
    cfg, state, bundle, enc = fitted(qcfg)
    data = serialize_bitstream(bundle, enc, cfg, qcfg)
    for cut in range(4, len(data) - 1, max(1, len(data) // 64)):
        with pytest.raises((ValueError, IndexError, Exception)) as ei:
            deserialize_bitstream(data[:cut])
        assert not isinstance(ei.value, (SystemError, MemoryError)), \
            f"cut={cut}: {type(ei.value)}"


def test_corruption_fuzz_no_native_crash():
    """Random single-byte corruptions must either raise ValueError or decode
    to SOME array — the process must never crash or allocate absurdly."""
    qcfg = QuantConfig(decode_cap=32)
    cfg, state, bundle, enc = fitted(qcfg)
    data = bytearray(serialize_bitstream(bundle, enc, cfg, qcfg))
    rng = np.random.default_rng(11)
    for _ in range(60):
        i = int(rng.integers(4, len(data)))
        orig = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            deserialize_bitstream(bytes(data))
        except (ValueError, IndexError, KeyError):
            pass
        finally:
            data[i] = orig


def test_gaussian_stream_decode_is_erf_independent(monkeypatch):
    """v2 ships the rANS counts table, so decoding must NOT depend on the
    decoder's libm erf (a 1-ulp erf difference on another platform would
    otherwise rebuild a different table and desynchronize the stream)."""
    import math

    from gaussianimage_plus_tpu.compress.bitstream import (
        _pack_gaussian, _unpack_stream)

    rng = np.random.default_rng(7)
    vals = np.clip(rng.normal(500, 40, size=3000), 0, 1023).astype(np.int64)
    packed = _pack_gaussian(vals)

    true_erf = math.erf
    monkeypatch.setattr(math, "erf",
                        lambda x: true_erf(x) * (1 + 1e-9) + 1e-12)
    out, _ = _unpack_stream(b"\x01" + packed, 0, version=2)
    np.testing.assert_array_equal(out, vals)

"""Self-contained serialized bitstream: codes + side tables -> bytes -> image.

The reference's Cholesky model keeps a full ANS round trip — compress() emits
rANS streams with histogram/unique side tables, decompress() rebuilds the
attributes and renders (gaussianimage_cholesky.py:419-447, utils.py:61-89).
This module is the equivalent capability for this repo's codec: ONE byte
string holds everything a decoder needs — header, quantizer grids, entropy
side tables, and rANS code streams — and ``decode_bitstream`` turns it back
into an ``Encoding`` + minimal ``QuantizerBundle`` ready for
``decompress_wo_ec`` / ``prepare_decode``.

Layout (little-endian):

  header:  magic 'GIPB', version, param/mode tags, bit widths, H, W,
           n_active, decode_cap
  grids:   xy affine grid (lsq mode), log-variance grid, covariance affine
           grid, color affine grid or ResidualVQ codebooks
  streams: xy (raw fp16 in fp16 mode, fixed-width bit-packed otherwise),
           then covariance and color, each rANS-coded under the smaller of
           two models (1-byte tag): categorical with dtype-minimized
           uniques + u32 histogram (utils.py:61-77), or global-Gaussian
           whose whole side info is (mean, std, vmin, vmax)
           (utils.py:94-110)

Reported bpp from ``len(data) * 8 / (H * W)`` is the rate of the actual
shippable artifact, unlike ``analysis_wo_ec``'s bit-width accounting.
Inactive rows are dropped at serialize time (render is order-independent
summation, so compaction is lossless); decode pads back to a sublane
multiple with invalid rows.
"""

from __future__ import annotations

import struct as _struct
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .entropy import (
    compress_categorical,
    compress_gaussian,
    decode_rans,
    decompress_gaussian,
    gaussian_counts,
)
from .pipeline import Encoding, QuantConfig, QuantizerBundle
from .quantizers import (
    HybridQuantParams,
    LogQuantState,
    UniformQuantParams,
)

MAGIC = b"GIPB"
# v2: the global-Gaussian (tag-1) stream ships its u32 rANS counts table
# instead of rebuilding it from (mean, std) at decode — math.erf is libm-
# dependent, and a 1-count difference desynchronizes the whole stream on a
# platform with a differently-rounded erf. v1 streams remain decodable (the
# erf rebuild is bit-faithful on the encoding platform).
VERSION = 2
_XY_MODES = {"lsq": 0, "fp16": 1}
_COLOR_MODES = {"lsq": 0, "vq": 1}
_DTYPE_TAGS = {0: np.uint8, 1: np.uint16, 2: np.uint32,
               3: np.int8, 4: np.int16, 5: np.int32}
_TAG_OF = {np.dtype(v): k for k, v in _DTYPE_TAGS.items()}


def _pack_categorical(values: np.ndarray) -> bytes:
    """rANS stream + side tables for one integer matrix (utils.py:61-77)."""
    flat = np.asarray(values).astype(np.int64).reshape(-1)
    words, counts, unique = compress_categorical(flat)
    out = [_struct.pack("<IIB", flat.size, unique.size, _TAG_OF[unique.dtype])]
    out.append(unique.tobytes())
    out.append(counts.astype(np.uint32).tobytes())
    out.append(_struct.pack("<I", words.size))
    out.append(words.tobytes())
    return b"".join(out)


def _pack_gaussian(values: np.ndarray) -> bytes:
    """rANS stream under the global-Gaussian model
    (compress_matrix_flatten_gaussian_global, utils.py:94-110). The u32
    counts table over [vmin, vmax] IS shipped (v2): rebuilding it from
    (mean, std) at decode depends on the decoder's libm erf rounding, and a
    single off-by-one count corrupts everything after it."""
    flat = np.asarray(values).astype(np.int64).reshape(-1)
    words, mean, std, vmin, vmax = compress_gaussian(flat)
    counts = gaussian_counts(mean, std, vmin, vmax)
    # u16 is exact: counts are a normalized pmf scaled by 2^16 with floor,
    # so every entry is < 65536 whenever the support has >1 symbol (always:
    # compress_gaussian widens vmin==vmax). Raise (not assert — stripped
    # under -O) so a violated invariant fails at encode, not as a
    # desynchronized stream at decode.
    if int(counts.max()) > 0xFFFF:
        raise ValueError(
            f"gaussian counts overflow u16 (max {int(counts.max())}); "
            f"support [{vmin}, {vmax}] degenerate")
    return b"".join([
        _struct.pack("<IiiI", flat.size, vmin, vmax, words.size),
        counts.astype(np.uint16).tobytes(),
        words.tobytes()])


def _pack_stream(values: np.ndarray) -> bytes:
    """Whichever of the two models is smaller, behind a 1-byte tag."""
    cat, gau = _pack_categorical(values), _pack_gaussian(values)
    return (b"\x00" + cat) if len(cat) <= len(gau) else (b"\x01" + gau)


def _check(cond: bool, what: str):
    """Untrusted-input validation: raise a uniform ValueError, never feed
    inconsistent sizes/tables to numpy allocations or the native rANS
    decoder (ADVICE r2: malformed .gipb must fail loudly in Python)."""
    if not cond:
        raise ValueError(f"malformed bitstream: {what}")


# header n caps every stream's symbol count: the largest stream is n rows x 3
# columns; anything bigger than that in a length field is corruption.
_MAX_SYMS = 1 << 28


def _unpack_stream(buf: bytes, off: int, version: int = VERSION,
                   max_syms: int = _MAX_SYMS) -> Tuple[np.ndarray, int]:
    _check(off < len(buf), "truncated before stream tag")
    tag = buf[off]
    off += 1
    if tag == 0:
        _check(off + 9 <= len(buf), "truncated categorical header")
        n_sym, n_unique, dtag = _struct.unpack_from("<IIB", buf, off)
        off += 9
        _check(0 < n_sym <= max_syms, f"categorical n_sym {n_sym}")
        _check(dtag in _DTYPE_TAGS, f"unknown dtype tag {dtag}")
        dt = np.dtype(_DTYPE_TAGS[dtag])
        _check(0 < n_unique <= min(n_sym, 1 << 24),
               f"categorical n_unique {n_unique}")
        need = n_unique * (dt.itemsize + 4) + 4
        _check(off + need <= len(buf), "truncated categorical tables")
        unique = np.frombuffer(buf, dt, n_unique, off).copy()
        off += n_unique * dt.itemsize
        counts = np.frombuffer(buf, np.uint32, n_unique, off).copy()
        off += n_unique * 4
        (n_words,) = _struct.unpack_from("<I", buf, off)
        off += 4
        _check(off + n_words * 2 <= len(buf), "truncated categorical words")
        _check(int(counts.sum()) > 0 and int(counts.min()) > 0,
               "categorical counts table has zero entries")
        _check(int(counts.sum()) == n_sym,
               "categorical counts do not sum to n_sym")
        words = np.frombuffer(buf, np.uint16, n_words, off).copy()
        off += n_words * 2
        idx = decode_rans(words, counts, n_sym)
        _check(bool((idx >= 0).all() and (idx < n_unique).all()),
               "categorical indices out of range")
        return unique.astype(np.int64)[idx], off
    _check(tag == 1, f"unknown stream tag {tag}")
    if version == 1:
        hdr = _struct.calcsize("<IffiiI")
        _check(off + hdr <= len(buf), "truncated gaussian(v1) header")
        n_sym, mean, std, vmin, vmax, n_words = _struct.unpack_from(
            "<IffiiI", buf, off)
        off += hdr
        _check(0 < n_sym <= max_syms, f"gaussian n_sym {n_sym}")
        _check(vmax >= vmin and vmax - vmin < (1 << 20),
               f"gaussian support [{vmin}, {vmax}]")
        _check(np.isfinite(mean) and np.isfinite(std) and std > 0,
               "gaussian (mean, std) invalid")
        _check(off + n_words * 2 <= len(buf), "truncated gaussian(v1) words")
        words = np.frombuffer(buf, np.uint16, n_words, off).copy()
        off += n_words * 2
        return decompress_gaussian(words, mean, std, vmin, vmax, n_sym), off
    hdr = _struct.calcsize("<IiiI")
    _check(off + hdr <= len(buf), "truncated gaussian header")
    n_sym, vmin, vmax, n_words = _struct.unpack_from("<IiiI", buf, off)
    off += hdr
    _check(0 < n_sym <= max_syms, f"gaussian n_sym {n_sym}")
    _check(vmax >= vmin and vmax - vmin < (1 << 20),
           f"gaussian support [{vmin}, {vmax}]")
    support = vmax - vmin + 1
    _check(off + support * 2 + n_words * 2 <= len(buf),
           "truncated gaussian tables/words")
    counts = np.frombuffer(buf, np.uint16, support, off).astype(np.uint32)
    off += support * 2
    _check(int(counts.sum()) > 0, "gaussian counts table all zero")
    words = np.frombuffer(buf, np.uint16, n_words, off).copy()
    off += n_words * 2
    sym = decode_rans(words, counts, n_sym)
    _check(bool((counts[sym] > 0).all()),
           "decoded symbols fall on zero-count slots")
    return sym.astype(np.int64) + vmin, off


def _f32s(*arrays) -> bytes:
    return b"".join(np.asarray(a, dtype=np.float32).tobytes() for a in arrays)


def _pack_bits(vals: np.ndarray, bits: int) -> bytes:
    """Fixed-width bit-pack of non-negative ints (positions keep their fixed
    rate in the reference too — analysis keeps position_bpp un-entropy-coded,
    train_quantize.py:250-252; 12-bit codes on a few thousand points are
    near-unique, so a categorical model would LOSE to fixed width)."""
    v = np.asarray(vals).astype(np.uint64).reshape(-1)
    out = np.zeros((v.size * bits + 7) // 8, dtype=np.uint8)
    bitpos = np.arange(v.size, dtype=np.uint64) * bits
    for b in range(bits):
        byte = ((bitpos + b) >> 3).astype(np.int64)
        off = (bitpos + b) & 7
        np.add.at(out, byte, (((v >> b) & 1) << off).astype(np.uint8))
    return out.tobytes()


def _unpack_bits(buf: bytes, off: int, count: int, bits: int):
    nbytes = (count * bits + 7) // 8
    arr = np.frombuffer(buf, np.uint8, nbytes, off)
    bitpos = np.arange(count, dtype=np.uint64) * bits
    v = np.zeros(count, dtype=np.uint64)
    for b in range(bits):
        byte = ((bitpos + b) >> 3).astype(np.int64)
        o = (bitpos + b) & 7
        v |= ((arr[byte] >> o) & 1).astype(np.uint64) << b
    return v, off + nbytes


class DecodedBitstream(NamedTuple):
    enc: Encoding
    bundle: QuantizerBundle
    qcfg: QuantConfig
    H: int
    W: int
    bound: jnp.ndarray      # zeros — cov codes already carry the bound
    bpp: float


def serialize_bitstream(bundle: QuantizerBundle, enc: Encoding,
                        cfg, qcfg: QuantConfig) -> bytes:
    """Encoding -> one self-contained byte string."""
    active = np.asarray(enc.active).astype(bool)
    n = int(active.sum())
    out = [MAGIC, _struct.pack(
        "<BBBBBBBxIIII", VERSION, 0, _XY_MODES[qcfg.xy_quant],
        _COLOR_MODES[qcfg.color_quant], qcfg.xy_bit, qcfg.cov_bit,
        qcfg.color_bit, cfg.H, cfg.W, n,
        qcfg.decode_cap if qcfg.decode_cap > 0 else cfg.tile_cap)]

    # grids
    if qcfg.xy_quant != "fp16":
        out.append(_f32s(bundle.xy.scale, bundle.xy.beta))
    out.append(_f32s(enc.log_state.beta, enc.log_state.scale,
                     bundle.cov.cov.scale, bundle.cov.cov.beta))
    if qcfg.color_quant == "vq":
        layers = bundle.color_vq.layers
        K, D = layers[0].embed.shape
        out.append(_struct.pack("<HHH", len(layers), K, D))
        out.append(_f32s(*[cb.embed for cb in layers]))
    else:
        out.append(_f32s(bundle.color.scale, bundle.color.beta))

    # streams (active rows only)
    if qcfg.xy_quant == "fp16":
        out.append(np.asarray(enc.quant_means)[active]
                   .astype(np.float16).tobytes())
    else:
        out.append(_pack_bits(np.asarray(enc.quant_means)[active],
                              qcfg.xy_bit))
    out.append(_pack_stream(np.asarray(enc.quant_cov)[active]))
    out.append(_pack_stream(np.asarray(enc.color_codes)[active]))
    return b"".join(out)


def deserialize_bitstream(data: bytes) -> DecodedBitstream:
    """Bytes -> (Encoding, minimal bundle, qcfg, H, W, bound, actual bpp)."""
    if data[:4] != MAGIC:
        raise ValueError("not a GIPB bitstream")
    (version, param, xy_mode, color_mode, xy_bit, cov_bit, color_bit,
     H, W, n, decode_cap) = _struct.unpack_from("<BBBBBBBxIIII", data, 4)
    if version not in (1, VERSION):
        raise ValueError(f"unsupported bitstream version {version}")
    off = 4 + _struct.calcsize("<BBBBBBBxIIII")

    def f32(count):
        nonlocal off
        a = np.frombuffer(data, np.float32, count, off).copy()
        off += count * 4
        return jnp.asarray(a)

    xy_quant = {v: k for k, v in _XY_MODES.items()}[xy_mode]
    color_quant = {v: k for k, v in _COLOR_MODES.items()}[color_mode]
    if xy_quant != "fp16":
        xy_params = UniformQuantParams(scale=f32(2), beta=f32(2))
    else:
        xy_params = UniformQuantParams(scale=jnp.ones(2), beta=jnp.zeros(2))
    log_state = LogQuantState(beta=f32(1)[0], scale=f32(1)[0])
    cov_params = HybridQuantParams(
        cov=UniformQuantParams(scale=f32(1), beta=f32(1)))
    color_vq = None
    if color_quant == "vq":
        from .residual_vq import ResidualVQState, VQCodebook

        n_layers, K, D = _struct.unpack_from("<HHH", data, off)
        off += 6
        layers = []
        for _ in range(n_layers):
            embed = f32(K * D).reshape(K, D)
            layers.append(VQCodebook(embed=embed,
                                     cluster_size=jnp.zeros((K,)),
                                     embed_avg=embed))
        color_vq = ResidualVQState(layers=tuple(layers))
        color_params = UniformQuantParams(scale=jnp.ones(3), beta=jnp.zeros(3))
        n_color_cols = n_layers
    else:
        color_params = UniformQuantParams(scale=f32(3), beta=f32(3))
        n_color_cols = 3

    if xy_quant == "fp16":
        xy_codes = np.frombuffer(data, np.float16, n * 2, off) \
            .copy().astype(np.float32).reshape(n, 2)
        off += n * 2 * 2
    else:
        flat, off = _unpack_bits(data, off, n * 2, xy_bit)
        xy_codes = flat.astype(np.float32).reshape(n, 2)
    cov_flat, off = _unpack_stream(data, off, version)
    cov_codes = cov_flat.astype(np.float32).reshape(n, 3)
    col_flat, off = _unpack_stream(data, off, version)
    color_codes = col_flat.reshape(n, n_color_cols)
    color_codes = (color_codes.astype(np.int32) if color_quant == "vq"
                   else color_codes.astype(np.float32))

    M = max(8, -(-n // 8) * 8)   # pad to a sublane multiple of invalid rows

    def pad(a, fill=0):
        return jnp.asarray(np.concatenate(
            [a, np.full((M - n,) + a.shape[1:], fill, a.dtype)], axis=0))

    enc = Encoding(
        means=pad(xy_codes),        # filled below for fp16; lsq decodes lazily
        quant_means=pad(xy_codes),
        quant_cov=pad(cov_codes),
        color_codes=pad(color_codes),
        log_state=log_state,
        active=jnp.asarray(np.arange(M) < n),
        num_active=jnp.asarray(n, jnp.int32),
    )
    bundle = QuantizerBundle(
        xy=xy_params, cov=cov_params, color=color_params,
        xy_opt=None, cov_opt=None, color_opt=None,
        step=jnp.zeros((), jnp.int32), color_vq=color_vq)
    qcfg = QuantConfig(xy_bit=xy_bit, cov_bit=cov_bit, color_bit=color_bit,
                       xy_quant=xy_quant, color_quant=color_quant,
                       decode_cap=decode_cap)
    bound = jnp.zeros((M, 3))
    return DecodedBitstream(enc=enc, bundle=bundle, qcfg=qcfg, H=H, W=W,
                            bound=bound, bpp=len(data) * 8.0 / (H * W))


def decode_bitstream(data: bytes, cfg=None, backend=None):
    """Bytes -> rendered [H, W, 3] image + the decoded pieces.

    ``cfg`` overrides the render config (tile sizes, backend); by default a
    GaussianConfig is built from the header. ``backend`` forwards to
    ``decompress_wo_ec`` ('binned' default; 'sweep' = the chunk-skip sweep
    decoder, fastest on Morton-ordered streams). Returns
    (image, DecodedBitstream)."""
    import dataclasses

    from ..models.gaussian_image import GaussianConfig
    from .pipeline import decompress_wo_ec

    dec = deserialize_bitstream(data)
    M = dec.enc.active.shape[0]
    if cfg is None:
        cfg = GaussianConfig(H=dec.H, W=dec.W, max_num_points=M,
                             tile_cap=dec.qcfg.decode_cap or 256)
    else:
        cfg = dataclasses.replace(cfg, H=dec.H, W=dec.W, max_num_points=M)
    img = decompress_wo_ec(dec.bundle, dec.enc, dec.bound, cfg, dec.qcfg,
                           backend=backend)
    return img, dec

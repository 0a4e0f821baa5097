"""Native rANS codec roundtrips and rate sanity."""

import numpy as np
import pytest

from gaussianimage_plus_tpu.compress.entropy import (
    categorical_bits,
    compress_categorical,
    decode_rans,
    decompress_categorical,
    encode_rans,
    gaussian_global_bits,
)


class TestRans:
    def test_roundtrip_uniform(self):
        rng = np.random.default_rng(0)
        syms = rng.integers(0, 16, 5000).astype(np.int32)
        counts = np.bincount(syms, minlength=16).astype(np.uint32)
        words = encode_rans(syms, counts)
        dec = decode_rans(words, counts, syms.size)
        np.testing.assert_array_equal(dec, syms)

    def test_roundtrip_skewed(self):
        rng = np.random.default_rng(1)
        syms = rng.choice(8, p=[0.7, 0.1, 0.05, 0.05, 0.04, 0.03, 0.02, 0.01],
                          size=20000).astype(np.int32)
        counts = np.bincount(syms, minlength=8).astype(np.uint32)
        words = encode_rans(syms, counts)
        dec = decode_rans(words, counts, syms.size)
        np.testing.assert_array_equal(dec, syms)
        # rate close to entropy
        p = counts / counts.sum()
        entropy = -(p[p > 0] * np.log2(p[p > 0])).sum()
        bits = words.size * words.itemsize * 8
        assert bits < syms.size * entropy * 1.05 + 256

    def test_categorical_roundtrip(self):
        rng = np.random.default_rng(2)
        data = rng.integers(-50, 4000, (300, 3))
        words, counts, unique = compress_categorical(data)
        rec = decompress_categorical(words, counts, unique, data.size, data.shape)
        np.testing.assert_array_equal(rec, data)

    def test_gaussian_global_bits(self):
        rng = np.random.default_rng(3)
        data = np.clip(rng.normal(500, 80, 15000), 0, 1023)
        bits = gaussian_global_bits(data)
        # should beat raw 10-bit storage for a gaussian-shaped histogram
        assert 0 < bits < 10 * data.size

    def test_categorical_bits_reasonable(self):
        rng = np.random.default_rng(4)
        data = rng.integers(0, 64, 6000)
        bits = categorical_bits(data)
        assert 0 < bits < 8 * data.size

"""Tests for the Pallas DFD kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_video_tpu.ops.dfd import dfd_series
from pyannote_video_tpu.ops import dfd_pallas


class TestPallasDFD:
    @pytest.mark.slow
    def test_matches_xla_in_interpret_mode(self):
        from jax.experimental import pallas as pl

        rng = np.random.default_rng(0)
        gray = jnp.asarray(rng.uniform(0, 255, (6, 50, 85)).astype(np.float32))
        ref = np.asarray(dfd_series(gray))
        # run the kernel through the Pallas interpreter (no TPU needed)
        import functools
        import unittest.mock as mock

        orig = pl.pallas_call

        def interp_call(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        with mock.patch.object(
            dfd_pallas.pl, "pallas_call", side_effect=interp_call
        ):
            out = np.asarray(dfd_pallas.dfd_series_pallas.__wrapped__(gray))
        assert out.shape == ref.shape
        # block-mean via pooling matmuls vs reshape: tiny float drift only
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=0.2)

    @pytest.mark.slow

    def test_non_block_multiple_width(self):
        # W=88 (not a multiple of block=5): the padded-frame VMEM block must
        # be cropped to the kernel footprint or TPU lowering rejects it
        # (block dims must equal array dims) — regression for the 720p
        # streaming shape 50x88
        from jax.experimental import pallas as pl
        import unittest.mock as mock

        rng = np.random.default_rng(3)
        gray = jnp.asarray(rng.uniform(0, 255, (6, 50, 88)).astype(np.float32))
        ref = np.asarray(dfd_series(gray))
        orig = pl.pallas_call

        def interp_call(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        with mock.patch.object(
            dfd_pallas.pl, "pallas_call", side_effect=interp_call
        ):
            out = np.asarray(dfd_pallas.dfd_series_pallas.__wrapped__(gray))
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=0.2)

    def test_auto_falls_back_on_cpu(self):
        rng = np.random.default_rng(1)
        gray = jnp.asarray(rng.uniform(0, 255, (4, 40, 60)).astype(np.float32))
        out = np.asarray(dfd_pallas.dfd_series_auto(gray))
        ref = np.asarray(dfd_series(gray))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_pair_padding(self):
        # n_pairs not divisible by PAIRS_PER_PROGRAM must still be exact
        rng = np.random.default_rng(2)
        gray = jnp.asarray(rng.uniform(0, 255, (12, 40, 60)).astype(np.float32))
        ref = np.asarray(dfd_series(gray))
        assert len(ref) == 11  # 11 % 8 != 0
        out = np.asarray(dfd_pallas.dfd_series_auto(gray))
        np.testing.assert_allclose(out, ref, atol=1e-4)

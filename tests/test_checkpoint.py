"""Orbax checkpoint save/restore round-trip (resume semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.models import GaussianConfig, init_state, render
from gaussianimage_plus_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = GaussianConfig(H=32, W=48, max_num_points=64)
        st = init_state(cfg, 40, jax.random.PRNGKey(0))
        # make it non-trivial: deactivate some, change bound rows
        st = st.replace(active=st.active.at[5].set(False),
                        num_active=st.num_active - 1)
        save_checkpoint(tmp_path / "ck", st, extra={"psnr": 31.5})

        template = init_state(cfg, 1, jax.random.PRNGKey(1))
        restored, extra = load_checkpoint(tmp_path / "ck", template)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(extra["psnr"]) == 31.5
        # the restored state renders identically
        np.testing.assert_allclose(np.asarray(render(st, cfg)),
                                   np.asarray(render(restored, cfg)), atol=1e-7)


class TestCrossPlatformFallback:
    def test_numpy_fallback_restore(self, tmp_path, monkeypatch):
        """Checkpoints written on another platform carry sharding metadata the
        default restore can't satisfy; load_checkpoint falls back to
        restoring every leaf as plain numpy (exercised by forcing the first
        restore attempt to fail the way orbax does cross-platform)."""
        import orbax.checkpoint as ocp

        cfg = GaussianConfig(H=16, W=16, max_num_points=16)
        st = init_state(cfg, 8, jax.random.PRNGKey(0))
        save_checkpoint(tmp_path / "ck", st, extra={"next_iter": 123})

        orig = ocp.PyTreeCheckpointer.restore
        calls = {"n": 0}

        def flaky(self, path, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 1 and not kw.get("restore_args"):
                raise ValueError("sharding passed to deserialization should "
                                 "be specified")
            return orig(self, path, *a, **kw)

        monkeypatch.setattr(ocp.PyTreeCheckpointer, "restore", flaky)
        st2, extra = load_checkpoint(tmp_path / "ck", st)
        assert calls["n"] >= 2  # fallback path taken
        np.testing.assert_array_equal(np.asarray(st2.params.xyz),
                                      np.asarray(st.params.xyz))
        assert int(extra["next_iter"]) == 123

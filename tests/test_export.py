"""Serving-artifact export round-trip (tools/export.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.inference import InferenceEngine
from vid2vid_tpu.tools.export import load_exported, save_exported


@pytest.fixture(scope="module")
def setup():
    opt = Options(
        label_nc=8, use_instance=True, fg=False,
        ngf=8, n_downsample_G=2, n_blocks=2, n_scales_spatial=1,
        n_frames_G=3, norm="batch", bf16=False, isTrain=False,
    )
    eng = InferenceEngine(opt)
    params = eng.init(jax.random.key(0), 1, 32, 64)
    return opt, eng, params


class TestExportRoundTrip:
    def test_exported_step_matches_engine(self, setup, tmp_path_factory):
        opt, eng, params = setup
        out = str(tmp_path_factory.mktemp("exp") / "artifact")
        save_exported(out, opt, params, 1, 32, 64)
        step = load_exported(out)

        rng = np.random.default_rng(0)
        tG = opt.n_frames_G
        labels = rng.integers(0, 8, (1, tG + 1, 32, 64)).astype(np.int32)
        inst = rng.integers(0, 3, (1, tG + 1, 32, 64)).astype(np.int32)

        state_ref = eng.initial_state(1, 32, 64)
        state_exp = None
        for t in range(2):
            lw = jnp.asarray(labels[:, t : t + tG])
            iw = jnp.asarray(inst[:, t : t + tG])
            frame_ref, state_ref = eng.step(params, lw, iw, state_ref)
            frame_exp, state_exp = step(lw, iw, state_exp)
            np.testing.assert_allclose(
                np.asarray(frame_exp), np.asarray(frame_ref),
                atol=1e-5, err_msg=f"frame {t}",
            )

    def test_artifact_files(self, setup, tmp_path_factory):
        opt, eng, params = setup
        out = tmp_path_factory.mktemp("exp2") / "artifact"
        save_exported(str(out), opt, params, 1, 32, 64)
        for fname in ("step.hlo", "params.npz", "state0.npz", "meta.json"):
            assert (out / fname).exists(), fname

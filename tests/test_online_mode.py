"""Streaming stitcher: per-frame emission + equivalence with batch meshes."""

import numpy as np
import jax.numpy as jnp

from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.pipeline.online import OnlineStitcher
from stabstitch2_tpu.pipeline.stitcher import init_stitcher

from synthetic import make_two_view_clip

MH, MW = 128, 160


class TestOnlineStitcher:
    def test_latency_and_counts(self):
        T = 10
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=21)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        online = OnlineStitcher(st)
        emitted = []
        per_push = []
        for t in range(T):
            outs = online.push(v1[t], v2[t])
            per_push.append(len(outs))
            emitted += outs
        # nothing until the first full window, then 7 at once, then 1/frame
        assert per_push[:6] == [0] * 6
        assert per_push[6] == 7
        assert per_push[7:] == [1] * (T - 7)
        assert len(emitted) == T
        shapes = {e.shape for e in emitted}
        assert len(shapes) == 1  # constant canvas
        assert all(np.isfinite(e.astype(np.float32)).all() for e in emitted)

    def test_meshes_match_batch_pipeline(self):
        T = 9
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=22)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        lo1 = v1.astype(np.float32) / 127.5 - 1.0
        lo2 = v2.astype(np.float32) / 127.5 - 1.0
        batch = st.stitch_arrays(v1, lo1, v2, lo2)

        online = OnlineStitcher(st)
        online_meshes = []
        for t in range(T):
            online.push(v1[t], v2[t])
            if t == 6:
                # capture the first window's smooth meshes via the batch
                pass
        # compare the streaming state-derived smooth mesh of the LAST frame:
        # recompute it the streaming way and check against the batch output
        ts1w = jnp.stack(online._ts1).at[0].set(0.0)
        ts2w = jnp.stack(online._ts2).at[0].set(0.0)
        sm1w, _ = online._smooth(st.smooth_vars, jnp.stack(online._smesh1),
                                 jnp.stack(online._smesh2), ts1w, ts2w)
        np.testing.assert_allclose(np.asarray(sm1w[-1]),
                                   np.asarray(batch.smooth_mesh1[-1]),
                                   rtol=1e-3, atol=5e-3)

"""End-to-end online two-video stitching orchestration.

Parity target: ``test()`` in Full_model_inference/Codes/test_online_ssd.py
(see SURVEY.md §3.1). Phases: load -> spatial -> temporal -> transport ->
smooth -> composite -> encode, with the reference's cumulative fps report.
The reference's missing-argument bug at test_online_ssd.py:399 (warp/fusion
modes not forwarded) is fixed by construction here.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.config import MODEL_H, MODEL_W, WINDOW, StitchConfig
from stabstitch2_tpu.models import SmoothNet, SpatialNet, TemporalNet
from stabstitch2_tpu.pipeline.compositor import Canvas, composite_begin
from stabstitch2_tpu.pipeline.motion import (MotionEstimator,
                                             _pad_to_jit)
from stabstitch2_tpu.pipeline.smoothing import smooth_all_windows
from stabstitch2_tpu.pipeline.transport import (
    stitched_meshes,
    transport_both_views,
)


@dataclasses.dataclass
class StitchResult:
    frames: np.ndarray            # [T, out_h, out_w, 3] float 0..255 (BGR)
    canvas: Canvas
    fps: Dict[str, float]         # cumulative fps after each phase
    smooth_mesh1: jnp.ndarray     # [T, GH+1, GW+1, 2] model-res meshes
    smooth_mesh2: jnp.ndarray
    ori_mesh1: jnp.ndarray
    ori_mesh2: jnp.ndarray
    ms: Dict[str, float] = dataclasses.field(default_factory=dict)
    # per-phase wall-clock (upload / spatial / temporal / smooth /
    # warp_fuse / download / encode), reference-style attribution
    frame_format: str = "bgr"     # 'bgr' [T,H,W,3] or 'i420' [T,H*3//2,W]


@dataclasses.dataclass
class _PendingStitch:
    """In-flight video: composite enqueued, downloads draining."""

    state: tuple              # composite_begin pending state
    smooth: Dict
    timer: object
    T: int


@dataclasses.dataclass
class VideoStitcher:
    """Bundles the model triad and runs the full online pipeline."""

    spatial_net: SpatialNet
    spatial_vars: dict
    temporal_net: TemporalNet
    temporal_vars: dict
    smooth_net: SmoothNet
    smooth_vars: dict
    config: StitchConfig = dataclasses.field(default_factory=StitchConfig)
    chunk: int = 8
    model_h: int = MODEL_H
    model_w: int = MODEL_W
    # 'bulk' = one upload per video (fastest through a high-latency link);
    # 'stream' = per-chunk uploads interleaved with motion compute (right
    # choice on real PCIe hosts; measured slower through the dev tunnel)
    upload_mode: str = "bulk"
    # optional multi-chip inference: a jax.sharding.Mesh with a 'data'
    # axis. Frame batches are placed sharded over 'data' and the model
    # variables replicated; GSPMD then partitions every phase (backbones,
    # smoothing, compositing) across chips with no code changes — the
    # reference (single-GPU, per-frame) has no counterpart. Frame counts
    # not divisible by the axis are padded at upload and cropped from the
    # outputs (_put_frames), so dp inference always shards. DESIGN CHOICE:
    # inference meshes are data-parallel only (init_stitcher builds tp=1)
    # — at batch-per-chip >= 1 dp is communication-free, while TP would
    # all-reduce every conv; TP exists for training (parallel/sharding.py)
    # where optimizer+activation memory is the constraint.
    mesh: Optional["jax.sharding.Mesh"] = None
    # True (default, round-4 chip A/B): run phases 1-4 through
    # motion_smooth (2 dispatches instead of ~20 eager chunk dispatches)
    # in the bulk stitch paths. Fused is ~35 ms/video cheaper on device
    # (67.7 vs 102 ms motion, BENCH_r03 device_phase_ms) and won
    # single-video wall in all interleaved A/B reps (17.5/21.9/18.1 vs
    # 16.9/21.6/15.3 fps) with sustained a wash inside link noise
    # (examples/ab_fused_motion.py, BENCHMARKS round 4). Costs the
    # per-phase spatial/temporal attribution — set False (cli
    # --eager_motion) to get the reference-style phase breakdown and the
    # view-1-compute-under-view-2-upload overlap. upload_mode='stream'
    # keeps its own eager per-chunk interleave regardless.
    fused_motion: bool = True
    # True: block on each phase so StitchResult carries the reference-style
    # per-phase fps/ms attribution (test_online_ssd.py:302,395,402,418).
    # False: enqueue the whole video without intermediate host syncs — the
    # per-phase numbers become enqueue-side approximations, but stitch_begin
    # returns sooner, widening the cross-video overlap window (the sustained
    # pipeline's begin must fit under the previous video's download drain).
    sync_phases: bool = True

    def __post_init__(self):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(self.mesh, PartitionSpec())
            self.spatial_vars = jax.device_put(self.spatial_vars, rep)
            self.temporal_vars = jax.device_put(self.temporal_vars, rep)
            self.smooth_vars = jax.device_put(self.smooth_vars, rep)
        self._motion = MotionEstimator(self.spatial_net, self.spatial_vars,
                                       self.temporal_net, self.temporal_vars,
                                       chunk=self.chunk)

        @functools.partial(jax.jit, static_argnames=("mh", "mw"))
        def _preprocess(hi_u8, mh, mw):
            # uint8 upload + on-device resize/normalize: the tunnel to the
            # chip is bandwidth-bound, so frames cross it once, as uint8
            x = hi_u8.astype(jnp.float32)
            if hi_u8.shape[1] != mh or hi_u8.shape[2] != mw:
                x = jax.image.resize(x, (x.shape[0], mh, mw, 3), "bilinear")
            return x / 127.5 - 1.0

        @jax.jit
        def _unpack_i420(packed_u8):
            # 1.5-byte/px uploads: packed I420 -> uint8 BGR on device
            from stabstitch2_tpu.ops.yuv import unpack_i420_u8

            return unpack_i420_u8(packed_u8)

        smooth_net = self.smooth_net
        window = self.config.window
        mh_, mw_ = self.model_h, self.model_w

        @jax.jit
        def _smooth_phase(smooth_vars, tmotion1, smotion1, tmotion2,
                          smotion2):
            # transport + stitched meshes + all-windows smoothing traced as
            # ONE program: the eager version issues dozens of small
            # dispatches whose enqueue overhead through the remote tunnel
            # (~200 ms) dwarfs the ~77 ms of actual device compute
            ts1, ts2 = transport_both_views(tmotion1, smotion1, tmotion2,
                                            smotion2, mh_, mw_)
            smesh1 = stitched_meshes(smotion1, mh_, mw_)
            smesh2 = stitched_meshes(smotion2, mh_, mw_)
            return smooth_all_windows(smooth_net, smooth_vars, smesh1,
                                      smesh2, ts1, ts2, window=window)

        spatial_net = self.spatial_net
        temporal_net = self.temporal_net
        chunk_ = self.chunk

        @jax.jit
        def _motion_fused(svars, tvars, lo1, lo2):
            """Spatial + temporal motion for BOTH views as ONE program.

            lo*: [Tb, mh, mw, 3] normalized, Tb % chunk == 0 (bucket-padded;
            padding never reaches a kept output — motion at t depends on
            frames <= t). Internally chunked with lax.map so per-step
            memory matches the eager chunked drivers, but the whole phase
            is ONE dispatch — through a remote tunnel the dispatch count
            is the latency, and the eager path issues ~15-25 of them.
            Used by the metric/N-view paths (motion_smooth); the two-view
            stitch keeps the eager chunked drivers, whose dispatches
            interleave with the uploads.
            """
            from stabstitch2_tpu.models.spatial import spatial_motions
            from stabstitch2_tpu.models.temporal import TemporalNet as _TN

            Tb = lo1.shape[0]
            nb = Tb // chunk_
            c1 = lo1.reshape(nb, chunk_, mh_, mw_, 3)
            c2 = lo2.reshape(nb, chunk_, mh_, mw_, 3)

            def sp(args):
                a, b = args
                off, mref, mtgt = spatial_net.apply(svars, a, b, False)
                out = spatial_motions(off, mref, mtgt, mh_, mw_)
                return out["motion1"], out["motion2"]

            sm1, sm2 = jax.lax.map(sp, (c1, c2))
            sm1 = sm1.reshape(Tb, *sm1.shape[2:])
            sm2 = sm2.reshape(Tb, *sm2.shape[2:])

            def ft(args):
                a, b = args
                return temporal_net.apply(tvars, jnp.concatenate([a, b], 0),
                                          False, method=_TN.features)

            feats = jax.lax.map(ft, (c1, c2))  # [nb, 2c, fh, fw, ch]
            fsh = feats.shape[2:]
            f1 = feats[:, :chunk_].reshape(Tb, *fsh)
            f2 = feats[:, chunk_:].reshape(Tb, *fsh)

            def shift(f):  # f[t] -> f[t+1] (tail repeats; cropped below)
                return jnp.concatenate([f[1:], f[-1:]], 0)

            def pm(args):
                p, n = args
                return temporal_net.apply(tvars, p, n,
                                          method=_TN.motion_from_features)

            # both views stacked per step ([2*chunk] batches — the SAME
            # compiled shapes as the eager temporal_pair driver, so the
            # bf16 convs reduce identically and outputs are bit-equal)
            def grid(f):
                return f.reshape(nb, chunk_, *fsh)

            p_all = jnp.concatenate([grid(f1), grid(f2)], axis=1)
            n_all = jnp.concatenate([grid(shift(f1)), grid(shift(f2))],
                                    axis=1)
            m = jax.lax.map(pm, (p_all, n_all))        # [nb, 2c, ...]
            m_all = jnp.stack(
                [m[:, :chunk_].reshape(Tb, *m.shape[2:]),
                 m[:, chunk_:].reshape(Tb, *m.shape[2:])])
            # m_all[v, t] is motion t -> t+1; reference layout is
            # motion[t] = t-1 -> t with zeros at t=0
            zero = jnp.zeros_like(m_all[:, :1])
            tm = jnp.concatenate([zero, m_all[:, :-1]], axis=1)
            return sm1, sm2, tm[0], tm[1]

        self._preprocess = _preprocess
        self._unpack_i420 = _unpack_i420
        self._smooth_phase = _smooth_phase
        self._motion_fused = _motion_fused

    def _smooth_bucketed(self, tmotion1, smotion1, tmotion2, smotion2,
                         T: int, crop: bool = True):
        """Transport + all-windows smoothing, ONE jitted program per bucket.

        Motion inputs are [T, GH+1, GW+1, 2]; the frame dim is padded
        (repeat-last) up to a 16-frame bucket so a dataset of
        variable-length videos compiles one program per bucket, not per
        length. Exact: frame t's smooth mesh depends only on frames <= t
        (window t-6..t), so end-padding never reaches a kept frame.
        ``crop=False`` returns the padded arrays (full arrays at Tb
        frames, win_* at Tb-window+1 windows) for callers that mask
        instead of slicing (the metric harness keeps everything jitted).
        """
        bucket = 16
        # inputs may already be LONGER than T (dp inference pads the frame
        # dim to the data-axis multiple, see _put_frames) — bucket from the
        # array length, crop to the true T
        L = int(tmotion1.shape[0])
        Tb = -(-max(L, T) // bucket) * bucket
        if Tb != L:
            # jitted, not eager: inputs are GSPMD-sharded under dp
            # inference (see motion._pad_to_jit)
            def _pad(x):
                return _pad_to_jit(x, Tb)
            tmotion1, smotion1 = _pad(tmotion1), _pad(smotion1)
            tmotion2, smotion2 = _pad(tmotion2), _pad(smotion2)
        smooth = self._smooth_phase(self.smooth_vars, tmotion1, smotion1,
                                    tmotion2, smotion2)
        if crop and Tb != T:
            nw = T - self.config.window + 1
            smooth = {k: (v[:nw] if k.startswith("win_") else v[:T])
                      for k, v in smooth.items()}
        return smooth

    def motion_smooth(self, lo1j: jnp.ndarray, lo2j: jnp.ndarray,
                      crop: bool = True, n_frames: Optional[int] = None):
        """Phases 1-4 (spatial/temporal motion -> transport -> windowed
        smoothing) as TWO dispatches per video: one fused motion program
        (internally lax.map-chunked, see _motion_fused) + the fused
        transport+smooth program, both keyed on the 16-frame bucket.
        lo*: [T, mh, mw, 3] normalized [-1, 1] (device or host);
        ``n_frames`` overrides the true frame count when the inputs are
        already padded (dp inference pads uploads to the data axis)."""
        T = int(n_frames) if n_frames else lo1j.shape[0]
        bucket = 16
        # inputs may already be longer than T (dp-padded uploads)
        Tb = -(-max(T, int(lo1j.shape[0])) // bucket) * bucket
        Tb = -(-Tb // self.chunk) * self.chunk  # lax.map needs chunk | Tb

        def _pad(x):
            if x.shape[0] == Tb:
                return jnp.asarray(x)
            if isinstance(x, np.ndarray):  # pad before upload (cheap)
                return jnp.asarray(np.concatenate(
                    [x, np.repeat(x[-1:], Tb - x.shape[0], 0)], 0))
            return _pad_to_jit(x, Tb)  # jitted: sharded under dp

        sm1, sm2, tm1, tm2 = self._motion_fused(
            self.spatial_vars, self.temporal_vars, _pad(lo1j), _pad(lo2j))
        smooth = self._smooth_phase(self.smooth_vars, tm1, sm1, tm2, sm2)
        if crop and Tb != T:
            nw = T - self.config.window + 1
            smooth = {k: (v[:nw] if k.startswith("win_") else v[:T])
                      for k, v in smooth.items()}
        return smooth

    def _put_frames(self, x, dtype=np.uint8,
                    pad_to_axis: bool = True) -> jnp.ndarray:
        """Upload a host frame array, sharded over the mesh's 'data' axis
        when one is configured. Frame counts that don't divide the axis are
        padded (repeat-last) up to the next multiple so dp inference ALWAYS
        shards — callers track the true count and crop derived outputs
        (padding never changes a kept frame: motion/smooth for frame t
        depend only on frames <= t). ``pad_to_axis=False`` keeps the input
        shape (stream chunks share one compiled shape; non-divisible chunks
        stay replicated, still correct). Arrays already on device pass
        through unchanged; dtype=None keeps the input dtype (the compositor
        accepts float 0..255 frames)."""
        if not isinstance(x, np.ndarray):
            return jnp.asarray(x)
        x = np.ascontiguousarray(x, dtype or x.dtype)
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape["data"]
        if pad_to_axis and x.shape[0] % dp != 0:
            pad = dp - x.shape[0] % dp
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], 0)
        spec = (P("data", *([None] * (x.ndim - 1)))
                if x.shape[0] % dp == 0 else P())
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def stitch_arrays(self, hi1: np.ndarray,
                      lo1: Optional[np.ndarray],
                      hi2: np.ndarray,
                      lo2: Optional[np.ndarray]) -> StitchResult:
        """hi*: [T,H,W,3] uint8 BGR, or packed I420 [T, H*3//2, W] uint8
        (1.5 bytes/px — the thinnest upload; see data.video_io.bgr_to_i420);
        lo*: [T, mh, mw, 3] in [-1, 1] or None to resize+normalize on
        device (the fast path — frames cross the host<->device link once,
        as uint8)."""
        return self.stitch_finish(self.stitch_begin(hi1, lo1, hi2, lo2))

    def stitch_begin(self, hi1: np.ndarray,
                     lo1: Optional[np.ndarray],
                     hi2: np.ndarray,
                     lo2: Optional[np.ndarray]):
        """Enqueue one video's full pipeline; return pending state.

        Nothing is fetched: call :meth:`stitch_finish` to collect. Callers
        that stream many videos should begin video k+1 BEFORE finishing
        video k — the k-th video's composite downloads (the pipeline's
        bottleneck leg on a tunneled chip) then drain underneath the
        (k+1)-th video's uploads, motion, and smoothing. See cli.cmd_stitch.
        """
        from stabstitch2_tpu.utils.profiling import PhaseTimer

        T = hi1.shape[0]
        if T < WINDOW:
            raise ValueError(f"video too short: {T} < window {WINDOW}")
        timer = PhaseTimer(T)
        snc = (lambda x: x) if self.sync_phases else (lambda x: None)
        smooth = None

        mh, mw = self.model_h, self.model_w
        if (lo1 is None or lo2 is None) and self.upload_mode == "stream":
            # per-chunk uploads with each chunk's preprocess+motion work
            # enqueued as its upload lands (overlaps h2d with compute)
            c = self.chunk
            # dtype preserved (no silent uint8 truncation of float frames) —
            # same contract as the bulk lo-provided branch; uint8/I420 input
            # stays the fast path
            h1 = np.ascontiguousarray(hi1)
            h2 = np.ascontiguousarray(hi2)

            def upload_chunks(h):
                out = []
                for s in range(0, T, c):
                    e = min(s + c, T)
                    piece = h[s:e]
                    if e - s < c:  # pad tail to the compiled chunk shape
                        piece = np.concatenate(
                            [piece, np.repeat(piece[-1:], c - (e - s), 0)], 0)
                    out.append(self._put_frames(piece, dtype=None,
                                                pad_to_axis=False))
                return out

            chunks1 = upload_chunks(h1)
            chunks2 = upload_chunks(h2)
            timer.mark("upload", sync=snc(chunks1[-1]))
            if hi1.ndim == 3:  # packed I420 chunks -> uint8 BGR on device
                chunks1 = [self._unpack_i420(c) for c in chunks1]
            if hi2.ndim == 3:
                chunks2 = [self._unpack_i420(c) for c in chunks2]
            lo1_chunks = [self._preprocess(x, mh, mw) for x in chunks1]
            lo2_chunks = [self._preprocess(x, mh, mw) for x in chunks2]
            smotion1, smotion2 = self._motion.spatial_chunks(
                lo1_chunks, lo2_chunks, T)
            timer.mark("spatial", sync=snc((smotion1, smotion2)))
            feats1 = self._motion.features_chunks(lo1_chunks, T)
            feats2 = self._motion.features_chunks(lo2_chunks, T)
            tmotion1 = self._motion.temporal_from_features(feats1)
            tmotion2 = self._motion.temporal_from_features(feats2)
            timer.mark("temporal", sync=snc((tmotion1[0], tmotion2[0])))
            hi1_dev = jnp.concatenate(chunks1, 0)[:T]
            hi2_dev = jnp.concatenate(chunks2, 0)[:T]
        else:
            if lo1 is None or lo2 is None:
                # enqueue view-1's preprocess + temporal motion right after
                # its upload so that compute hides under view-2's transfer
                # (the relay's h2d runs concurrently with device compute)
                hi1_dev = self._put_frames(hi1)
                if hi1.ndim == 3:   # packed I420 [T, H*3//2, W]
                    hi1_dev = self._unpack_i420(hi1_dev)
                lo1j = self._preprocess(hi1_dev, mh, mw)
                if not self.fused_motion:
                    tmotion1 = self._motion.temporal(lo1j)
                hi2_dev = self._put_frames(hi2)
                timer.mark("upload", sync=snc(hi2_dev))
                if hi2.ndim == 3:
                    hi2_dev = self._unpack_i420(hi2_dev)
                lo2j = self._preprocess(hi2_dev, mh, mw)
            else:
                # dtype preserved: this path accepts float 0..255 hi frames
                hi1_dev = self._put_frames(hi1, dtype=None)
                hi2_dev = self._put_frames(hi2, dtype=None)
                if hi1_dev.ndim == 3:  # packed I420 [T, H*3//2, W]
                    hi1_dev = self._unpack_i420(hi1_dev)
                if hi2_dev.ndim == 3:
                    hi2_dev = self._unpack_i420(hi2_dev)
                lo1j = self._put_frames(lo1, dtype=np.float32)
                lo2j = self._put_frames(lo2, dtype=np.float32)
                timer.mark("upload", sync=snc((lo1j, lo2j)))
                if not self.fused_motion:
                    tmotion1 = self._motion.temporal(lo1j)
            if self.fused_motion:
                # phases 1-4 in two dispatches (motion_smooth); per-phase
                # attribution collapses into 'smooth'
                smooth = self.motion_smooth(lo1j, lo2j, n_frames=T)
                timer.mark("spatial")
                timer.mark("temporal")
                timer.mark("smooth", sync=snc(smooth["smooth_mesh1"]))
            else:
                smotion1, smotion2 = self._motion.spatial(lo1j, lo2j)
                timer.mark("spatial", sync=snc((smotion1, smotion2)))
                tmotion2 = self._motion.temporal(lo2j)
                timer.mark("temporal", sync=snc((tmotion1[0], tmotion2[0])))
                smooth = None

        if smooth is None:
            # phases 3+4: transport + batched sliding-window smoothing, one
            # jit per 16-frame bucket (see _smooth_bucketed)
            smooth = self._smooth_bucketed(tmotion1, smotion1, tmotion2,
                                           smotion2, T)
            timer.mark("smooth", sync=snc(smooth["smooth_mesh1"]))

        # phase 5: composite at native resolution — enqueue only; chunk
        # downloads are requested async and drain in the background
        state = composite_begin(hi1_dev, hi2_dev, smooth["smooth_mesh1"],
                                smooth["smooth_mesh2"],
                                config=self.config, chunk=self.chunk,
                                model_size=(mh, mw), n_frames=T,
                                # under dp inference the Pallas kernels are
                                # shard_mapped over the batch axis inside
                                # the chunk program (round 5) — the mesh is
                                # threaded instead of forfeiting them
                                shard_mesh=self.mesh)
        return _PendingStitch(state=state, smooth=smooth, timer=timer, T=T)

    def stitch_finish(self, pending: "_PendingStitch") -> StitchResult:
        """Collect the frames enqueued by :meth:`stitch_begin`."""
        from stabstitch2_tpu.pipeline.compositor import composite_finish

        timer = pending.timer
        frames, canvas = composite_finish(pending.state, timer=timer)
        timer.fps["composite"] = pending.T / (time.time() - timer.t0)
        smooth = pending.smooth
        fmt = ("i420" if getattr(self.config, "download_format", "bgr")
               == "yuv420" else "bgr")
        return StitchResult(frames=frames, canvas=canvas, fps=timer.fps,
                            ms=timer.ms, frame_format=fmt,
                            smooth_mesh1=smooth["smooth_mesh1"],
                            smooth_mesh2=smooth["smooth_mesh2"],
                            ori_mesh1=smooth["ori_mesh1"],
                            ori_mesh2=smooth["ori_mesh2"])

    def stitch_video_dir(self, video_dir: str,
                         output_path: Optional[str] = None) -> StitchResult:
        """Stitch one <video>/video1+video2 directory, optionally encode mp4."""
        from stabstitch2_tpu.data.video_io import load_video_pair, write_video

        hi1, lo1, hi2, lo2 = load_video_pair(
            video_dir, model_size=(self.model_h, self.model_w))
        result = self.stitch_arrays(hi1, lo1, hi2, lo2)
        if output_path:
            t0 = time.time()
            write_video(output_path, result.frames,
                        frame_format=result.frame_format)
            result.fps["encode"] = len(result.frames) / max(
                time.time() - t0, 1e-9)
        return result


def init_stitcher(rng_seed: int = 0, config: Optional[StitchConfig] = None,
                  model_h: int = MODEL_H, model_w: int = MODEL_W,
                  chunk: int = 8, compute_dtype=None,
                  smooth_dtype=None,
                  n_devices: Optional[int] = None) -> VideoStitcher:
    """Fresh stitcher with randomly initialized models (for tests/benches;
    real use loads converted or trained checkpoints via utils.checkpoint).

    ``compute_dtype`` runs the spatial/temporal conv backbones in that
    dtype (params stay f32); the INFERENCE DEFAULT IS bfloat16 — validated
    against reference-weight goldens at <0.01 px max motion delta
    (tests/test_models.py::TestBF16Backbone). Pass ``jnp.float32`` for
    bit-exact parity runs. The smooth net stays f32 by default: its inputs
    are absolute mesh coordinates (~480), which bf16's 8 mantissa bits
    would quantize to ~2 px. Geometry ops are f32 regardless."""
    import jax

    dt = compute_dtype or jnp.bfloat16
    dev_mesh = None
    if n_devices and n_devices > 1:
        # pure data-parallel inference mesh (frames over 'data')
        from stabstitch2_tpu.parallel.sharding import make_mesh
        dev_mesh = make_mesh(n_devices, tp=1)
    # dp inference runs the same programs under GSPMD, where a bare pallas
    # cost volume cannot auto-partition — handing the models the mesh makes
    # cost_volume_auto shard_map the kernel over 'data', so multi-chip
    # inference keeps the fused kernel (round-3 pinned the jnp path here)
    spatial = SpatialNet(dtype=dt, corr_shard_mesh=dev_mesh)
    temporal = TemporalNet(dtype=dt, corr_shard_mesh=dev_mesh)
    smooth = SmoothNet(dtype=smooth_dtype or jnp.float32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
    img = jnp.zeros((1, model_h, model_w, 3))
    sv = spatial.init(k1, img, img, False)
    tv = temporal.init(k2, img, img, False)
    mesh = jnp.zeros((1, WINDOW, 7, 9, 2))
    mv = smooth.init(k3, mesh, mesh, mesh, mesh)
    return VideoStitcher(spatial, sv, temporal, tv, smooth, mv,
                         config=config or StitchConfig(), chunk=chunk,
                         model_h=model_h, model_w=model_w, mesh=dev_mesh)

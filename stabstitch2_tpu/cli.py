"""Command-line drivers (the reference's L4 script surface, unified).

Reference script -> subcommand map:
  Full_model_inference/test_online_{ssd,tra}.py      -> stitch
  Full_model_inference/test_online_tra_threeview.py  -> stitch-multi
  Full_model_inference/test_metric_ssd.py            -> metric
  {Spatial,Temporal,Smooth}Warp/train_{ssd,tra}.py   -> train-{stage} --preset
  {Spatial,Temporal}Warp/test_{ssd,tra}.py           -> export-motions
  (new) reference .pth triad conversion              -> convert

The reference's test_online_ssd.py:399 bug (warp/fusion modes never
forwarded) does not exist here: flags flow through StitchConfig.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_stitcher_args(p):
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="orbax triad directory")
    p.add_argument("--reference_pth_dir", type=str, default=None,
                   help="directory with the reference's *.pth triad")
    p.add_argument("--warp_mode", choices=["NORMAL", "FAST"], default="NORMAL")
    # reference defaults: ssd drivers fuse AVERAGE, tra drivers LINEAR
    # (test_online_ssd.py:444 vs test_online_tra.py:444)
    p.add_argument("--fusion_mode", choices=["AVERAGE", "LINEAR"],
                   default=None)
    p.add_argument("--preset", choices=["ssd", "tra"], default="ssd")
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler device trace here")
    p.add_argument("--download_format", choices=["bgr", "yuv420"],
                   default=None,
                   help="composite transfer format; stitch defaults to "
                        "yuv420 (encoder-native, half the d2h bytes), "
                        "other commands to bgr")
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel inference: shard frame batches over "
                        "a mesh of this many chips (GSPMD partitions every "
                        "phase; frame counts must divide evenly to split)")
    p.add_argument("--no_phase_sync", action="store_true",
                   help="skip the blocking per-phase timers: each video is "
                        "enqueued in one go, maximizing cross-video overlap "
                        "(per-phase fps become enqueue-side approximations)")
    p.add_argument("--fused_motion", action="store_true",
                   help="(default since round 4) run phases 1-4 as two "
                        "fused device programs instead of ~20 chunked "
                        "dispatches; kept for compatibility")
    p.add_argument("--eager_motion", action="store_true",
                   help="run phases 1-4 as eager chunked dispatches: "
                        "restores the reference-style per-phase "
                        "spatial/temporal fps attribution (and the "
                        "view-1-compute-under-view-2-upload overlap) at "
                        "~35 ms/video extra device time")
    p.add_argument("--upload_format", choices=["i420", "bgr"], default=None,
                   help="frame upload packing: i420 = 4:2:0, 1.5 bytes/px "
                        "(source jpgs/mp4s are 4:2:0 anyway), bgr = raw "
                        "3 bytes/px. Defaults: stitch/stitch-multi i420 "
                        "(production-thin), metric bgr (bit-faithful "
                        "parity instrument; i420 shifts PSNR ~0.015 dB)")


def _build_stitcher(args, download_default="bgr"):
    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.utils.checkpoint import stitcher_from_checkpoint

    fusion = args.fusion_mode or ("LINEAR" if args.preset == "tra"
                                  else "AVERAGE")
    cfg = StitchConfig(warp_mode=args.warp_mode, fusion_mode=fusion,
                       download_format=args.download_format
                       or download_default)
    stitcher = stitcher_from_checkpoint(
        ckpt_dir=args.ckpt_dir, reference_pth_dir=args.reference_pth_dir,
        config=cfg, chunk=args.chunk,
        n_devices=getattr(args, "n_devices", None))
    if getattr(args, "no_phase_sync", False):
        stitcher.sync_phases = False
    if getattr(args, "eager_motion", False):
        stitcher.fused_motion = False
    return stitcher


def cmd_stitch(args):
    import queue
    import threading

    from stabstitch2_tpu.data.video_io import (
        list_videos,
        load_video_pair,
        write_video,
    )

    stitcher = _build_stitcher(args, download_default="yuv420")
    videos = list_videos(args.test_path)
    if not videos:
        print(f"no videos under {args.test_path}", file=sys.stderr)
        return 1
    os.makedirs(args.output_path, exist_ok=True)
    from stabstitch2_tpu.utils.profiling import trace

    # pipeline: a loader thread decodes video k+1 (JPEG decode releases the
    # GIL in cv2/native code) while the accelerator stitches video k
    q: queue.Queue = queue.Queue(maxsize=1)
    model_size = (stitcher.model_h, stitcher.model_w)

    from stabstitch2_tpu.data.video_io import bgr_to_i420

    pack_i420 = (getattr(args, "upload_format", None) or "i420") != "bgr"

    def loader():
        for vd in videos:
            try:
                hi1, _, hi2, _ = load_video_pair(vd, model_size=model_size)
                if pack_i420:
                    try:  # 1.5-byte/px uploads (falls back on odd dims)
                        hi1, hi2 = bgr_to_i420(hi1), bgr_to_i420(hi2)
                    except ValueError:
                        pass
                q.put((vd, (hi1, None, hi2, None), None))
            except Exception as e:  # surface IO errors on the main thread
                q.put((vd, None, e))
        q.put(None)

    threading.Thread(target=loader, daemon=True).start()

    def finish_and_write(entry) -> int:
        name, out, pending, t0 = entry
        nonlocal failed
        try:
            result = stitcher.stitch_finish(pending)
            write_video(out, result.frames, frame_format=result.frame_format)
        except Exception as e:
            print(f"{name}: stitch failed: {e}", file=sys.stderr)
            failed += 1
            return 0
        result.fps["encode"] = len(result.frames) / max(time.time() - t0, 1e-9)
        print(f"{name}: {result.frames.shape[0]} frames -> {out} "
              f"canvas={result.canvas.out_w}x{result.canvas.out_h} "
              f"fps={ {k: round(v, 2) for k, v in result.fps.items()} } "
              f"({time.time() - t0:.1f}s)")
        return 1

    done = failed = 0

    # two-deep software pipeline: video k+1's uploads+motion+smoothing are
    # enqueued BEFORE video k's downloads are collected, so the d2h drain
    # (the bottleneck leg) overlaps the next video's compute
    in_flight = None
    while True:
        item = q.get()
        if item is None:
            break
        vd, loaded, err = item
        name = os.path.basename(vd)
        if err is not None:
            print(f"{name}: load failed: {err}", file=sys.stderr)
            failed += 1
            continue
        out = os.path.join(args.output_path, name + ".mp4")
        t0 = time.time()
        hi1, lo1, hi2, lo2 = loaded
        try:
            with trace(args.trace_dir):
                pending = stitcher.stitch_begin(hi1, lo1, hi2, lo2)
        except Exception as e:
            # one bad video (too short, canvas over the configured max, ...)
            # must not abort a dataset-scale run
            print(f"{name}: stitch failed: {e}", file=sys.stderr)
            failed += 1
            continue
        if in_flight is not None:
            done += finish_and_write(in_flight)
        in_flight = (name, out, pending, t0)
    if in_flight is not None:
        done += finish_and_write(in_flight)
    if done == 0:
        print("no videos stitched", file=sys.stderr)
        return 1
    if failed:
        print(f"{done} stitched, {failed} failed/skipped", file=sys.stderr)
    return 0


def cmd_stitch_multi(args):
    from stabstitch2_tpu.data.video_io import bgr_to_i420, load_view, write_video
    from stabstitch2_tpu.pipeline.threeview import (
        stitch_multi_begin,
        stitch_multi_finish,
    )

    stitcher = _build_stitcher(args, download_default="yuv420")

    def view_dirs(d):
        return sorted(v for v in os.listdir(d) if v.startswith("video")
                      and os.path.isdir(os.path.join(d, v)))

    root = args.video_dir
    if view_dirs(root):
        videos = [root]  # a single <dir>/video1..videoN clip
    else:  # a dataset directory of such clips
        videos = [os.path.join(root, d) for d in sorted(os.listdir(root))
                  if os.path.isdir(os.path.join(root, d))
                  and view_dirs(os.path.join(root, d))]
    if not videos:
        print(f"no videoN subdirectories under {root}", file=sys.stderr)
        return 1
    # dataset mode (root is a directory OF clips) writes <output>/<name>.mp4
    # even for a single clip — keyed on the MODE, not the clip count (a
    # one-clip dataset used to treat --output as a file path, round 5)
    multi = videos != [root]
    if multi:
        os.makedirs(args.output, exist_ok=True)

    pack_i420 = (getattr(args, "upload_format", None) or "i420") != "bgr"

    def load(vd):
        his = [load_view(vd, v, (stitcher.model_h, stitcher.model_w))[0]
               for v in view_dirs(vd)]
        if pack_i420:
            try:  # 1.5-byte/px uploads (falls back on odd dims)
                his = [bgr_to_i420(h) for h in his]
            except ValueError:
                pass
        return his

    def finish_and_write(entry) -> int:
        name, out, pending, t0 = entry
        nonlocal failed
        try:
            frames, fmt = stitch_multi_finish(pending)
            write_video(out, frames, frame_format=fmt)
        except Exception as e:
            print(f"{name}: stitch failed: {e}", file=sys.stderr)
            failed += 1
            return 0
        h = frames.shape[1] if fmt == "bgr" else frames.shape[1] * 2 // 3
        print(f"{name}: {frames.shape[0]} frames -> {out} "
              f"({frames.shape[2]}x{h}, {len(frames) / (time.time() - t0):.2f}"
              f" fps incl. load)")
        return 1

    # two-deep pipeline across clips: video k+1's uploads+motion+chain are
    # enqueued while video k's composite downloads drain (the 2-view
    # cmd_stitch design)
    done = failed = 0
    in_flight = None
    for vd in videos:
        name = os.path.basename(vd.rstrip("/"))
        out = (os.path.join(args.output, name + ".mp4") if multi
               else args.output)
        t0 = time.time()
        try:
            pending = stitch_multi_begin(stitcher, load(vd))
        except Exception as e:
            print(f"{name}: stitch failed: {e}", file=sys.stderr)
            failed += 1
            continue
        if in_flight is not None:
            done += finish_and_write(in_flight)
        in_flight = (name, out, pending, t0)
    if in_flight is not None:
        done += finish_and_write(in_flight)
    if done == 0:
        print("no videos stitched", file=sys.stderr)
        return 1
    if failed:
        print(f"{done} stitched, {failed} failed/skipped", file=sys.stderr)
    return 0


def cmd_metric(args):
    from stabstitch2_tpu.metrics.harness import evaluate_dataset

    stitcher = _build_stitcher(args)
    # metric defaults to the bit-faithful bgr upload (parity instrument);
    # --upload_format i420 is the opt-in fast path
    report = evaluate_dataset(stitcher, args.test_path,
                              max_videos=args.max_videos,
                              upload=getattr(args, "upload_format", None)
                              or "bgr")
    print(json.dumps({k: v for k, v in report.items() if k != "per_video"},
                     indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
    return 0


def cmd_train(args):
    from stabstitch2_tpu import config as C
    from stabstitch2_tpu.train import loop

    stage = args.stage
    nd = args.n_devices

    def with_max_epoch(cfg):
        if args.max_epoch:
            return type(cfg)(**{**cfg.__dict__, "max_epoch": args.max_epoch})
        return cfg

    if stage == "spatial":
        cfg = with_max_epoch(C.spatial_train_preset(args.preset))
        vgg_vars = None
        # only pay the torch import + ~550 MB state_dict load when the
        # recipe actually uses the perceptual term
        if getattr(args, "vgg_pth", None) and cfg.perception_weight > 0:
            import torch

            from stabstitch2_tpu.utils.torch_import import (
                convert_state_dict,
                vgg19_mapping,
            )

            sd = torch.load(args.vgg_pth, map_location="cpu")
            sd = {k: v.numpy() for k, v in sd.items()}
            params, _ = convert_state_dict(sd, vgg19_mapping())
            vgg_vars = {"params": params}
        loop.train_spatial(args.train_path, args.test_path, cfg,
                           model_dir=args.model_dir,
                           summary_dir=args.summary_dir,
                           vgg_variables=vgg_vars,
                           max_steps_per_epoch=args.max_steps_per_epoch,
                           n_devices=nd)
    elif stage == "temporal":
        cfg = with_max_epoch(C.temporal_train_preset(args.preset))
        loop.train_temporal(args.train_path, cfg, model_dir=args.model_dir,
                            summary_dir=args.summary_dir,
                            max_steps_per_epoch=args.max_steps_per_epoch,
                            n_devices=nd)
    elif stage == "smooth":
        cfg = with_max_epoch(C.smooth_train_preset(args.preset))
        loop.train_smooth(args.train_path, cfg, model_dir=args.model_dir,
                          summary_dir=args.summary_dir,
                          max_steps_per_epoch=args.max_steps_per_epoch,
                          n_devices=nd)
    return 0


def cmd_export(args):
    from stabstitch2_tpu.train.export import (
        export_spatial_motions,
        export_temporal_motions,
    )

    stitcher = _build_stitcher(args)
    if args.which in ("spatial", "both"):
        n = export_spatial_motions(stitcher, args.train_path)
        print(f"exported {n} spatial motion frames")
    if args.which in ("temporal", "both"):
        n = export_temporal_motions(stitcher, args.train_path)
        print(f"exported {n} temporal motion frames")
    return 0


def cmd_convert(args):
    from stabstitch2_tpu.utils.checkpoint import save_triad, triad_from_reference

    sv, tv, mv = triad_from_reference(args.reference_pth_dir)
    save_triad(args.out_dir, sv, tv, mv)
    print(f"converted triad -> {args.out_dir}")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="stabstitch2_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("stitch", help="two-view online stitching -> mp4s")
    p.add_argument("--test_path", required=True)
    p.add_argument("--output_path", default="results/")
    _add_stitcher_args(p)
    p.set_defaults(fn=cmd_stitch)

    p = sub.add_parser("stitch-multi", help="N-view stitching -> one mp4")
    p.add_argument("--video_dir", required=True,
                   help="directory with video1..videoN subdirs")
    p.add_argument("--output", default="out.mp4")
    _add_stitcher_args(p)
    p.set_defaults(fn=cmd_stitch_multi)

    p = sub.add_parser("metric", help="PSNR/SSIM/stability/distortion report")
    p.add_argument("--test_path", required=True)
    p.add_argument("--max_videos", type=int, default=None)
    p.add_argument("--out_json", type=str, default=None)
    _add_stitcher_args(p)
    p.set_defaults(fn=cmd_metric)

    p = sub.add_parser("train", help="train one stage")
    p.add_argument("stage", choices=["spatial", "temporal", "smooth"])
    p.add_argument("--train_path", required=True)
    p.add_argument("--test_path", default=None)
    p.add_argument("--preset", choices=["ssd", "tra"], default="ssd",
                   help="reference recipe preset")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--summary_dir", default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument("--vgg_pth", type=str, default=None,
                   help="torchvision vgg19 state_dict (.pth) for the tra "
                        "recipe's perceptual loss (spatial stage only); "
                        "required when the preset sets perception_weight>0")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard training over a (data, model) mesh of this "
                        "many devices (parallel/sharding.py)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("export-motions",
                       help="write Spatial/TemporalMotion npy streams")
    p.add_argument("--train_path", required=True)
    p.add_argument("--which", choices=["spatial", "temporal", "both"],
                   default="both")
    _add_stitcher_args(p)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("convert", help="reference .pth triad -> orbax triad")
    p.add_argument("--reference_pth_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.set_defaults(fn=cmd_convert)

    args = parser.parse_args(argv)
    if getattr(args, "model_dir", None) is None and args.cmd == "train":
        args.model_dir = f"model_{args.stage}_{args.preset}"
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

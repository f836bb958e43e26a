"""CLI: `python -m cartslam_tpu <config>` or `<source-config> <modules-config>`.

Mirrors the reference binary (src/main.cpp:8-67; README.md:7-17): builds the
System from JSON config, streams every frame through the pipeline, keeps
going on per-frame errors, and tears the viewer down at the end.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cart-tpu", description="TPU-native CART-SLAM pipeline"
    )
    parser.add_argument("config", nargs="+", help="config JSON (1 combined or 2 files)")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--timing", action="store_true", help="write timing CSVs")
    parser.add_argument("--save-samples", action="store_true")
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--show", action="store_true", help="open cv2 windows")
    parser.add_argument("--checkpoint", default=None, help="write state checkpoints here")
    parser.add_argument("--checkpoint-interval", type=int, default=100)
    parser.add_argument("--resume", default=None, help="resume from a checkpoint file")
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR",
    )
    parser.add_argument(
        "--module-timing", action="store_true",
        help="per-module timing rows (module-by-module execution; implies --timing)",
    )
    parser.add_argument(
        "--grayscale", action="store_true",
        help="whole-pipeline grayscale processing (CARTSLAM_IMAGE_MAKE_GRAYSCALE)",
    )
    parser.add_argument("--log-file", default="app.log")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[logging.StreamHandler(), logging.FileHandler(args.log_file)],
    )

    from .config import read_system_config
    from .runtime.timing import TimingWriter
    from .viz.ui import MultiSink, SampleSink, VideoSink, WindowViewer

    sinks = []
    viewer = None
    if args.show:
        viewer = WindowViewer()
        viewer.start()
        sinks.append(viewer)
    if args.save_samples:
        sinks.append(SampleSink())
    if args.record:
        sinks.append(VideoSink())
    sink = MultiSink(*sinks) if sinks else None

    system = read_system_config(
        *args.config,
        timing=TimingWriter(enabled=args.timing or args.module_timing),
        image_sink=sink,
        max_frames=args.max_frames,
        checkpoint_path=args.checkpoint,
        checkpoint_interval=args.checkpoint_interval,
        resume_from=args.resume,
        module_timing=args.module_timing,
        grayscale=args.grayscale,
    )
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            n = system.run()
    else:
        n = system.run()
    logging.getLogger("cart").info("processed %d frames", n)

    if viewer is not None:
        viewer.stop()
    for s in sinks:
        if hasattr(s, "close"):
            s.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

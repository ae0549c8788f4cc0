"""Sampler serving daemon: HTTP front-end over the MicroBatcher engine.

    python -m samplenet_tpu.serve --ckpt log/samplenet32/ckpt \
        --num-out-points 32 --num-points 1024 --port 8471

Protocol (stdlib-only, raw tensors — no framework needed client-side):
  POST /sample   body = float32 little-endian bytes of shape [n, N, 3]
                 (n inferred from the byte length)
                 -> 200, body = float32 bytes of shape [n, m, 3]
  GET  /healthz  -> 200, JSON {model config, max_batch, requests_served}

Each POSTed cloud is submitted to the MicroBatcher individually, so clouds
from CONCURRENT clients coalesce into one device dispatch (full batches
under load, <= max_wait_ms extra latency when idle).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _net_and_vars(args):
    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.train import checkpoints

    ckpt = checkpoints.restore(args.ckpt)
    net = SampleNet(
        num_out_points=args.num_out_points,
        bottleneck_size=args.bottleneck_size,
        group_size=args.group_size, sigma_mode="tf")
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    return net, variables


def build_sampler(args):
    """Serving engine from either source: a flax checkpoint (rebuilds the
    model and AOT-compiles) or a frozen StableHLO artifact (no model code —
    the versioned deployment format, serving.save_exported)."""
    if args.artifact:
        from samplenet_tpu.serving import ArtifactSampler

        sampler = ArtifactSampler(args.artifact)
        args.num_points = sampler.num_points
        args.max_batch = sampler.max_batch
        args.num_out_points = sampler.header.get(
            "num_out_points", args.num_out_points)
        return sampler
    from samplenet_tpu.serving import BatchedSampler

    net, variables = _net_and_vars(args)
    return BatchedSampler(net, variables, max_batch=args.max_batch,
                          num_points=args.num_points)


def make_server(batcher, args, stats):
    num_points = args.num_points

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "num_points": num_points,
                "num_out_points": args.num_out_points,
                "max_batch": args.max_batch,
                "requests_served": stats["served"],
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/sample":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            item = num_points * 3 * 4
            if length == 0 or length % item:
                self.send_error(400, f"body must be n*{item} bytes "
                                     f"(float32 [n, {num_points}, 3])")
                return
            clouds = np.frombuffer(raw, np.float32).reshape(-1, num_points, 3)
            futures = [batcher.submit(c) for c in clouds]
            out = np.stack([f.result(timeout=60) for f in futures])
            body = out.astype("<f4").tobytes()
            stats["served"] += len(clouds)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((args.host, args.port), Handler)


def parse_args(argv=None):
    p = argparse.ArgumentParser("serve")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir (rebuilds the model)")
    p.add_argument("--artifact", default=None,
                   help="frozen StableHLO artifact to serve from "
                        "(no checkpoint/model code needed)")
    p.add_argument("--export-artifact", default=None, metavar="PATH",
                   help="with --ckpt: write a frozen serving artifact to "
                        "PATH and exit")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--num-out-points", type=int, default=32)
    p.add_argument("--bottleneck-size", type=int, default=128)
    p.add_argument("--group-size", type=int, default=7)
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    return p.parse_args(argv)


def main(argv=None, *, serve_forever=True):
    from samplenet_tpu.serving import MicroBatcher
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    if not args.ckpt and not args.artifact:
        raise SystemExit("serve: one of --ckpt / --artifact is required")
    if args.export_artifact:
        from samplenet_tpu.serving import save_exported

        if not args.ckpt:
            raise SystemExit("--export-artifact requires --ckpt")
        net, variables = _net_and_vars(args)
        save_exported(
            args.export_artifact, net, variables, batch=args.max_batch,
            num_points=args.num_points, freeze_params=True,
            metadata={"num_out_points": args.num_out_points})
        print(f"wrote serving artifact to {args.export_artifact}", flush=True)
        return None, None
    sampler = build_sampler(args)
    batcher = MicroBatcher(sampler, max_wait_ms=args.max_wait_ms)
    stats = {"served": 0}
    server = make_server(batcher, args, stats)
    print(f"serving sampler ({args.num_points}->{args.num_out_points}) "
          f"on {args.host}:{server.server_address[1]}", flush=True)
    if serve_forever:
        try:
            server.serve_forever()
        finally:
            batcher.close()
    return server, batcher


if __name__ == "__main__":
    main()

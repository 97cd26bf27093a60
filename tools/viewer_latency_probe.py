#!/usr/bin/env python
"""User-visible viewer-loop latency through the REAL browser transport
(VERDICT r3 #4).

Drives web_viewer.make_server over actual localhost HTTP the way the
browser page does — orbit event, then fetch the displayed frame — and
measures the orbit→displayed-frame latency and the sustained FPS of a
drag loop, per transport format (jpeg / bmp / png). Appends one JSONL
row per (scene, fmt) to viewer_latency.jsonl, including the server-side
stage split (/stats "frame": dispatch, device+D2H, encode).

Reference equivalence: its EMA FPS line measures what the user sees
(cull_sort_test.cpp:56-63); this is the same number for the headless
browser transport.

Run on the real TPU:   python tools/viewer_latency_probe.py
CPU logic check:       python tools/viewer_latency_probe.py --cpu --n 2000
"""

import argparse
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=100_000,
                    help="random-scene size (c1/c7 regime)")
    ap.add_argument("--ply", default=None,
                    help="scene file instead of a random scene")
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--out", default="viewer_latency.jsonl")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from urllib.request import urlopen

    import jax

    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.viewer import Canvas
    from gaussianrenderer_tpu.web_viewer import make_server

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    canvas = Canvas(height=args.height, width=args.width)
    canvas.init(prewarm=False)
    if args.ply:
        canvas.load_gaussians(args.ply)
        scene_tag = os.path.basename(args.ply)
    else:
        canvas.set_scene(make_random_scene(args.n, seed=0))
        scene_tag = f"random_{args.n}"
    canvas.camera.set_position([0.0, 0.0, 6.0])
    canvas.camera.set_look_at([0.0, 0.0, 0.0])
    canvas.camera.update_camera_matrices()

    server = make_server(canvas, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, args.out)
    try:
        # First frame = compile; not part of the interactive number.
        t0 = time.time()
        urlopen(base + "/frame")
        log(f"first frame (compile): {time.time()-t0:.1f}s")

        for fmt in ("jpeg", "bmp", "png"):
            lat, sizes = [], []
            for i in range(args.frames):
                t0 = time.perf_counter()
                urlopen(f"{base}/orbit?dx=6&dy=1").read()
                body = urlopen(f"{base}/frame?fmt={fmt}&t={i}").read()
                lat.append((time.perf_counter() - t0) * 1e3)
                sizes.append(len(body))
            stats = json.loads(urlopen(base + "/stats").read())
            med = statistics.median(lat)
            row = dict(
                ts=time.time(),
                probe="viewer_latency",
                platform=jax.default_backend(),
                scene=scene_tag,
                resolution=f"{args.width}x{args.height}",
                fmt=fmt,
                frames=args.frames,
                orbit_to_frame_ms=round(med, 2),
                p90_ms=round(sorted(lat)[int(0.9 * len(lat))], 2),
                sustained_fps=round(1e3 / med, 1),
                frame_bytes=int(statistics.median(sizes)),
                server_stage_ms=stats.get("frame"),
                ema_ms=stats.get("ema_ms"),
            )
            with open(out, "a") as f:
                f.write(json.dumps(row) + "\n")
            log(f"{fmt}: orbit->frame median {med:.1f} ms "
                f"(p90 {row['p90_ms']} ms, {row['sustained_fps']} fps, "
                f"{row['frame_bytes']/1e3:.0f} kB) "
                f"server {row['server_stage_ms']}")

        # ---- the PUSH transport (/stream, VERDICT r4 #5): a drag loop
        # against the pipelined MJPEG stream — render(t+1) dispatches
        # before frame t's fetch+encode drains, so the sustained
        # frame-to-frame interval is max(render, fetch+encode), not
        # their sum. The reader consumes parts as the browser <img>
        # does; each /orbit marks the view dirty.
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", f"/stream?frames={args.frames + 1}")
        resp = conn.getresponse()

        def read_part():
            # boundary line(s) + headers
            clen = None
            while True:
                line = resp.fp.readline()
                if not line:
                    raise EOFError("stream closed")
                ls = line.strip()
                if ls.lower().startswith(b"content-length:"):
                    clen = int(ls.split(b":")[1])
                if ls == b"" and clen is not None:
                    break
            body = resp.fp.read(clen)
            resp.fp.readline()  # trailing CRLF
            return body

        urlopen(f"{base}/orbit?dx=2&dy=0").read()
        read_part()  # pipeline warm-up frame
        lat, sizes = [], []
        for i in range(args.frames):
            t0 = time.perf_counter()
            urlopen(f"{base}/orbit?dx=6&dy=1").read()
            body = read_part()
            lat.append((time.perf_counter() - t0) * 1e3)
            sizes.append(len(body))
        conn.close()
        stats = json.loads(urlopen(base + "/stats").read())
        med = statistics.median(lat)
        row = dict(
            ts=time.time(),
            probe="viewer_latency",
            platform=jax.default_backend(),
            scene=scene_tag,
            resolution=f"{args.width}x{args.height}",
            fmt="stream",
            frames=args.frames,
            orbit_to_frame_ms=round(med, 2),
            p90_ms=round(sorted(lat)[int(0.9 * len(lat))], 2),
            sustained_fps=round(1e3 / med, 1),
            frame_bytes=int(statistics.median(sizes)),
            server_stage_ms=stats.get("frame"),
            ema_ms=stats.get("ema_ms"),
        )
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        log(f"stream: orbit->frame median {med:.1f} ms "
            f"(p90 {row['p90_ms']} ms, {row['sustained_fps']} fps)")
        print(json.dumps(row))
    finally:
        server.shutdown()
        server.server_close()


if __name__ == "__main__":
    main()

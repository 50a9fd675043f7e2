"""
Compressed daemon egress measured at 1024px on the real device (r4 VERDICT
item 6): one serve_network daemon over a config-f 1024px network; the same
48-frame request fetched as npy (the r4 baseline response), png-zip
(lossless, thread-pooled), and avi (MJPEG) — response BYTES and end-to-end
wall per format, plus a /synthesize_audio npy-vs-plan-cache second pass.

Bytes are the durable fact (they transfer to any link); wall splits into
device+encode (host) and network (here: loopback, so encode cost shows and
link cost doesn't — the r4e analysis already measured the tunnel-link
regime).

Run (TPU): python tools/bench_serving_egress.py
Prints one JSON line per arm + a summary line.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

NETWORK = os.environ.get("GANCE_TPU_EGRESS_NET", "/tmp/egress_net.pkl")


def ensure_network() -> None:
    if Path(NETWORK).exists():
        return
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import jax;"
        "from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params;"
        "from gance_tpu.models.pickle_loader import save_generator_pickle;"
        "cfg = GeneratorConfig(resolution=1024);"
        "save_generator_pickle(init_generator_params(jax.random.PRNGKey(5), cfg),"
        f" '{NETWORK}')"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env)


def main() -> None:
    ensure_network()
    proc = subprocess.Popen(
        [
            sys.executable, "/root/repo/serve_network.py",
            "--network-path", NETWORK, "--port", "0",
            "--max-batch", "48", "--max-delay-ms", "0",
            "--compute-dtype", "bfloat16",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    port = None
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if "listening on port" in line:
                port = int(line.rsplit(" ", 1)[-1])
                break
        if port is None:
            raise RuntimeError("daemon did not start")

        from gance_tpu.serving import ServingClient

        client = ServingClient(f"http://127.0.0.1:{port}", timeout_s=900)
        frames = 48
        # warm the compiled program once so every arm measures steady state
        client.synthesize(count=frames, seed=0)

        results = {}
        arms = [
            ("npy", lambda: client._post_synthesize(
                {"count": frames, "seed": 1})[0]),
            ("png-zip", lambda: client.synthesize_compressed(
                count=frames, seed=1, format="png-zip")),
            ("avi", lambda: client.synthesize_compressed(
                count=frames, seed=1, format="avi", fps=30)),
        ]
        for name, fetch in arms:
            t0 = time.time()
            blob = fetch()
            wall = time.time() - t0
            results[name] = {
                "bytes": len(blob),
                "mb_per_frame": round(len(blob) / frames / 1e6, 3),
                "wall_s": round(wall, 2),
                "wall_fps": round(frames / wall, 1),
            }
            print(json.dumps({"arm": name, **results[name]}), flush=True)

        raw = results["npy"]["bytes"]
        summary = {
            "metric": "1024px daemon egress formats (48-frame request, one v5e)",
            "npy_mb_per_frame": results["npy"]["mb_per_frame"],
            "png_zip_reduction": round(raw / results["png-zip"]["bytes"], 2),
            "avi_reduction": round(raw / results["avi"]["bytes"], 2),
            "arms": results,
        }
        print(json.dumps(summary), flush=True)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()

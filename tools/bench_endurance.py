"""
Album-length endurance certification of the flagship pipeline (r4 VERDICT
item 3): one production-shaped `projection-file-blend` run — overlay on,
`--resumable`, every stage live — for >= 10k output frames, with:

  * a sampled host-RSS + device-HBM curve over the whole run (the
    GANCE_TPU_MEMWATCH hook; flat curves = the streaming design holds memory
    constant at hour scale, the property behind the reference's album-length
    4K render, /root/reference/README.md:19-21);
  * a kill -9 mid-run + resume (the durable-chunk contract at scale);
  * per-stage busy accounting from the pipeline's StageTimer logs;
  * optionally (--verify-uninterrupted) a second, uninterrupted run whose
    deliverable must be frame-exact equal to the resumed one.

Inputs are FABRICATED at production shape: a projection file with
`--frames / multiplier` target frames (the reference's real face video,
cycled, scaled to --resolution) + rows-identical final latents (a smoothed
random walk), and a WAV long enough for the output frame count. The network
is a random-init config-f at --resolution (synthesis COST is what endurance
measures; weights don't change it).

Run (TPU):
  GANCE_TPU_MEMWATCH=/tmp/endurance_mem.jsonl \
    python tools/bench_endurance.py --frames 10000 --workdir /tmp/endurance
Writes <workdir>/ENDURANCE.json (BENCH-style artifact).
"""

import argparse
import itertools
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

DEVON = "/root/reference/test/assets/devon_face_sample_short.mp4"


def fabricate_inputs(
    workdir: Path, frames: int, multiplier: int, resolution: int, fps: float
) -> dict:
    import numpy as np

    import gance_tpu  # noqa: F401 — compile cache + platform config
    import jax

    from gance_tpu.audio.io import fabricate_percussive_wav
    from gance_tpu.media.video import frames_in_video
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.file_writer import ProjectionFileWriter
    from gance_tpu.projection.projection_types import (
        LATEST_VERSION,
        ProjectionAttributes,
    )

    workdir.mkdir(parents=True, exist_ok=True)
    latent_count = frames // multiplier
    projection_fps = fps / multiplier

    config = GeneratorConfig(resolution=resolution)
    nets = workdir / "nets"
    nets.mkdir(exist_ok=True)
    for index in range(2):
        pkl = nets / f"{index}_net.pkl"
        if not pkl.exists():
            with jax.default_device(jax.devices("cpu")[0]):
                params = init_generator_params(jax.random.PRNGKey(index), config)
            save_generator_pickle(params, pkl)

    wav = workdir / "song.wav"
    seconds = frames / fps + 1.0
    if not wav.exists():
        fabricate_percussive_wav(wav, seconds=seconds)

    projection = workdir / "projection.hdf5"
    if not projection.exists():
        import cv2

        rows = config.num_style_rows
        rng = np.random.RandomState(0)
        # rows-identical latents following a smooth random walk (projection
        # latents of adjacent video frames are correlated; a walk keeps the
        # synthesized stream production-shaped rather than white-noise)
        steps = rng.randn(latent_count, 512).astype(np.float32) * 0.15
        row0 = np.cumsum(steps, axis=0) / np.sqrt(
            np.arange(1, latent_count + 1, dtype=np.float32)
        )[:, None]
        source = [
            cv2.resize(frame, (resolution, resolution), interpolation=cv2.INTER_CUBIC)
            for frame in itertools.islice(frames_in_video(Path(DEVON)).frames, 8)
        ]
        attrs = ProjectionAttributes(
            version_number=LATEST_VERSION, complete=False,
            original_target_path=DEVON,
            original_width_height=(resolution, resolution),
            projection_width_height=(resolution, resolution),
            target_md5_hash="0" * 32, original_network_path=str(nets / "0_net.pkl"),
            network_md5_hash="0" * 32, steps_in_projection=1,
            noises_shapes=np.nan, latents_histories_enabled=False,
            noises_histories_enabled=False, images_histories_enabled=False,
            original_fps=projection_fps, projection_fps=projection_fps,
            original_frame_count=latent_count,
            projection_frame_count=latent_count,
        )
        writer = ProjectionFileWriter(projection, attrs)
        for index in range(latent_count):
            target = source[index % len(source)]
            latent = np.tile(row0[index][None], (rows, 1))
            with writer.frame_writer() as frame_writer:
                frame_writer.finish(target, latent[None], target)
        writer.close(complete=True)

    return {
        "nets": nets, "wav": wav, "projection": projection,
        "latent_count": latent_count, "projection_fps": projection_fps,
    }


def blend_command(inputs: dict, output: Path, args) -> list:
    return [
        sys.executable, "/root/repo/music_into_networks.py",
        "projection-file-blend",
        "--wav", str(inputs["wav"]),
        "--output-path", str(output),
        "--networks-directory", str(inputs["nets"]),
        "--projection-file-path", str(inputs["projection"]),
        "--blend-depth", "10",
        "--output-fps", str(int(args.fps)),
        "--output-side-length", str(args.output_side),
        "--alpha", "0.5",
        "--phash-distance", "30", "--bbox-distance", "50",
        "--track-length", "5",
        "--overlay-detection-side", "256",
        "--resumable",
    ] + (["--compute-dtype", "bfloat16"] if not args.cpu else [])


def run_with_kill(command: list, env: dict, kill_after_frac: float,
                  total_frames: int, log: Path) -> dict:
    """Launch, kill -9 at ~kill_after_frac of expected progress (by durable
    part-file bytes growing), then resume to completion."""
    phases = []
    started = time.time()
    with open(log, "ab") as handle:
        proc = subprocess.Popen(command, stdout=handle, stderr=handle, env=env)
        # watch the resumable parts dir for progress; kill when the manifest
        # says >= kill_after_frac of frames are durable
        output = Path(command[command.index("--output-path") + 1])
        manifest = output.with_name(output.name + ".resume.json")
        killed = False
        while proc.poll() is None:
            time.sleep(10)
            done = 0
            if manifest.exists():
                try:
                    done = sum(
                        chunk.get("frames", 0)
                        for chunk in json.loads(manifest.read_text()).get("chunks", [])
                    )
                except (json.JSONDecodeError, OSError):
                    done = 0
            if not killed and done >= kill_after_frac * total_frames:
                proc.send_signal(signal.SIGKILL)
                killed = True
                phases.append({
                    "phase": "kill-9", "at_frames_durable": done,
                    "wall_s": round(time.time() - started, 1),
                })
                break
        proc.wait()
        if not killed:
            phases.append({
                "phase": "completed-before-kill-threshold",
                "rc": proc.returncode,
                "wall_s": round(time.time() - started, 1),
            })
            return {"phases": phases, "resumed": False}
    resume_started = time.time()
    with open(log, "ab") as handle:
        proc = subprocess.Popen(command, stdout=handle, stderr=handle, env=env)
        rc = proc.wait()
    phases.append({
        "phase": "resume-to-completion", "rc": rc,
        "wall_s": round(time.time() - resume_started, 1),
    })
    if rc != 0:
        raise RuntimeError(f"resumed run failed rc={rc}; see {log}")
    return {"phases": phases, "resumed": True}


def video_digest(path: Path) -> dict:
    """Frame-count + streaming md5 of DECODED frames (container timestamps
    may differ across runs; pixel content is the deliverable)."""
    import hashlib

    import cv2

    capture = cv2.VideoCapture(str(path))
    digest = hashlib.md5()
    count = 0
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        digest.update(frame.tobytes())
        count += 1
    capture.release()
    return {"frames": count, "md5": digest.hexdigest()}


def summarize_memwatch(path: Path) -> dict:
    records = []
    if path.exists():
        for line in path.read_text().splitlines():
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not records:
        return {"samples": 0}
    rss = [r["rss"] for r in records if r.get("rss")]
    hbm = [r["hbm"] for r in records if r.get("hbm")]

    def curve(series):
        if not series:
            return None
        quarter = max(1, len(series) // 4)
        return {
            "first_quarter_mean_mb": round(sum(series[:quarter]) / quarter / 1e6, 1),
            "last_quarter_mean_mb": round(sum(series[-quarter:]) / quarter / 1e6, 1),
            "peak_mb": round(max(series) / 1e6, 1),
        }

    return {
        "samples": len(records),
        "span_s": records[-1]["t"],
        "rss": curve(rss),
        "hbm": curve(hbm),
        "raw_path": str(path),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=10000)
    parser.add_argument("--fps", type=float, default=60.0)
    parser.add_argument("--multiplier", type=int, default=5)
    parser.add_argument("--resolution", type=int, default=1024,
                        help="network/native resolution")
    parser.add_argument("--output-side", type=int, default=1024)
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/endurance"))
    parser.add_argument("--kill-frac", type=float, default=0.4)
    parser.add_argument("--cpu", action="store_true",
                        help="tiny CPU smoke (tests)")
    parser.add_argument("--verify-uninterrupted", action="store_true",
                        help="second full run + frame-digest equality "
                        "(doubles wall time)")
    args = parser.parse_args()

    workdir = args.workdir
    inputs = fabricate_inputs(
        workdir, args.frames, args.multiplier, args.resolution, args.fps
    )
    print(json.dumps({
        "fabricated": {
            "latents": inputs["latent_count"],
            "output_frames": args.frames,
            "projection_fps": inputs["projection_fps"],
        }
    }), flush=True)

    memwatch = workdir / "memwatch.jsonl"
    memwatch.unlink(missing_ok=True)
    env = dict(
        os.environ,
        GANCE_TPU_MEMWATCH=str(memwatch),
        GANCE_TPU_EGRESS=os.environ.get("GANCE_TPU_EGRESS", "raw-spill"),
    )
    output = workdir / "endurance.avi"
    started = time.time()
    run_info = run_with_kill(
        blend_command(inputs, output, args), env, args.kill_frac,
        args.frames, workdir / "run.log",
    )
    wall = time.time() - started
    digest = video_digest(output)

    record = {
        "metric": "album-length endurance (projection-file-blend, overlay on, resumable)",
        "output_frames": digest["frames"],
        "requested_frames": args.frames,
        "resolution": args.resolution,
        "output_side": args.output_side,
        "wall_s": round(wall, 1),
        "wall_fps": round(digest["frames"] / wall, 2),
        "run": run_info,
        "deliverable_md5": digest["md5"],
        "memory": summarize_memwatch(memwatch),
    }
    # durable artifact BEFORE the optional (equally long) uninterrupted arm
    (workdir / "ENDURANCE.json").write_text(json.dumps(record, indent=1))
    print(json.dumps(record), flush=True)
    if args.verify_uninterrupted:
        clean_output = workdir / "endurance_clean.avi"
        clean_memwatch = workdir / "memwatch_clean.jsonl"
        clean_env = dict(env, GANCE_TPU_MEMWATCH=str(clean_memwatch))
        clean_args = blend_command(inputs, clean_output, args)
        with open(workdir / "run_clean.log", "ab") as handle:
            rc = subprocess.Popen(
                clean_args, stdout=handle, stderr=handle, env=clean_env
            ).wait()
        if rc != 0:
            raise RuntimeError(f"uninterrupted run failed rc={rc}")
        clean_digest = video_digest(clean_output)
        record["uninterrupted_md5"] = clean_digest["md5"]
        record["uninterrupted_memory"] = summarize_memwatch(clean_memwatch)
        record["resumed_equals_uninterrupted"] = (
            clean_digest == digest
        )
        (workdir / "ENDURANCE.json").write_text(json.dumps(record, indent=1))
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

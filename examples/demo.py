"""
End-to-end walk-through of every gance_tpu capability on a fabricated tiny network.

Run:  python examples/demo.py --output-directory /tmp/gance_demo [--resolution 32]

Produces, in order (mirroring a real GANce workflow):
  1. a StyleGAN2 network trained for a few steps on synthetic images,
     exported as an NVlabs-format .pkl (train -> resume -> export loop);
  2. random face-filtered stills + synthesis-file sidecars from that network;
  3. a source video projected into the network's latent space (HDF5 projection
     file with latent histories) + convergence analysis PNG;
  4. a noise-blend music video from a WAV;
  5. the flagship projection-file blend with eye-tracking overlay + debug tiles;
  6. the projection-file triptych visualization.

Everything runs on whatever backend JAX selects (CPU works; a TPU makes it fast).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def fabricate_wav(path: Path, seconds: float = 2.0, sample_rate: int = 44100) -> Path:
    """A percussive synthetic track (decaying noise bursts over a chirp) so the
    demo is self-contained — no reference checkout, no external assets."""
    from gance_tpu.audio.io import fabricate_percussive_wav

    return fabricate_percussive_wav(path, seconds, sample_rate, dtype="int16")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-directory", type=Path, required=True)
    parser.add_argument("--resolution", type=int, default=32)
    parser.add_argument(
        "--wav", type=Path, default=None,
        help="Soundtrack WAV; default: fabricate one in the output directory.",
    )
    args = parser.parse_args()

    out = args.output_directory
    out.mkdir(parents=True, exist_ok=True)

    import gance_tpu  # noqa: F401 (platform plumbing)
    from gance_tpu.media.images import write_image
    from gance_tpu.media.video import write_source_to_disk_consume

    if args.wav is None:
        args.wav = fabricate_wav(out / "soundtrack.wav")
        print("fabricated soundtrack:", args.wav)

    # ---- 0. synthetic "dataset" + source video --------------------------------
    rng = np.random.RandomState(0)
    dataset = out / "dataset"
    dataset.mkdir(exist_ok=True)
    for i in range(8):
        write_image(
            (rng.rand(args.resolution, args.resolution, 3) * 255).astype(np.uint8),
            dataset / f"sample_{i}.png",
        )
    source_video = out / "source.mp4"
    write_source_to_disk_consume(
        iter(
            (rng.rand(args.resolution, args.resolution, 3) * 255).astype(np.uint8)
            for _ in range(8)
        ),
        source_video,
        video_fps=30.0,
    )

    # ---- 1. train a tiny network, export a .pkl -------------------------------
    print("[1/6] training a tiny StyleGAN2 + exporting .pkl ...")
    from click.testing import CliRunner

    from gance_tpu.cli.train import cli as train_cli

    networks_dir = out / "networks"
    networks_dir.mkdir(exist_ok=True)
    network_pkl = networks_dir / "trained_network.pkl"
    result = CliRunner().invoke(
        train_cli,
        [
            "--dataset-directory", str(dataset),
            "--resolution", str(args.resolution),
            "--batch-size", "4",
            "--total-steps", "3",
            "--fmap-base", "512",
            "--fmap-max", "64",
            "--latent-size", "64",
            "--checkpoint-path", str(out / "train_ckpt.checkpoint"),
            "--checkpoint-every", "2",
            "--output-network", str(network_pkl),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0

    nets_json = out / "networks.json"
    nets_json.write_text(json.dumps({"networks": [str(network_pkl)]}))

    # ---- 2. stills + synthesis files ------------------------------------------
    print("[2/6] sampling stills with face filtering ...")
    from gance_tpu.cli.synthesize_images import cli as synth_cli

    result = CliRunner().invoke(
        synth_cli,
        [
            "images-from-network",
            "--networks-directory", str(networks_dir),
            "--output-directory", str(out / "stills"),
            "--num-faces", "0",
            "--no-faces", "2",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0

    # ---- 3. project the source video ------------------------------------------
    print("[3/6] projecting the source video (few steps) ...")
    from gance_tpu.projection.file_writer import project_video_to_file
    from gance_tpu.projection.visualization import visualize_projection_convergence

    projection_file = out / "projection.hdf5"
    project_video_to_file(
        path_to_video=source_video,
        path_to_network=network_pkl,
        projection_file_path=projection_file,
        steps_per_projection=4,
        latents_histories_enabled=True,
    )
    visualize_projection_convergence(projection_file, out / "convergence.png")

    # ---- 4. noise-blend music video --------------------------------------------
    print("[4/6] noise-blend music video ...")
    from gance_tpu.pipelines.noise_blend import noise_blend_api

    noise_blend_api(
        wav=[args.wav], output_path=out / "noise_blend.mp4",
        network_paths=[network_pkl], frames_to_visualize=12, output_fps=30.0,
        output_side_length=64, debug_path=out / "noise_blend_debug.mp4",
        debug_window=10, debug_side_length=64, alpha=0.25,
        fft_roll_enabled=True, fft_amplitude_range=(-1.0, 1.0),
    )

    # ---- 5. flagship projection-file blend with overlay ------------------------
    print("[5/6] projection-file blend with eye-tracking overlay ...")
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    projection_file_blend_api(
        wav=[args.wav], output_path=out / "flagship.mp4",
        network_paths=[network_pkl], frames_to_visualize=None, output_fps=30.0,
        output_side_length=64, debug_path=out / "flagship_debug.mp4",
        debug_window=10, debug_side_length=64, alpha=0.5,
        fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
        projection_file_path=projection_file, blend_depth=3,
        phash_distance=30, bbox_distance=50.0, track_length=1,
    )

    # ---- 6. projection triptych -------------------------------------------------
    print("[6/6] projection triptych video ...")
    from gance_tpu.projection.visualization import visualize_final_latents

    visualize_final_latents(
        projection_file_path=projection_file,
        output_video_path=out / "triptych.mp4",
        audio_paths=[args.wav],
        video_height=64,
    )

    print("\nDemo artifacts in", out)
    for artifact in sorted(out.iterdir()):
        print("  ", artifact.name)


if __name__ == "__main__":
    main()

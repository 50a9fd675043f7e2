"""Entry point matching the reference's `python project_video_to_file.py ...` invocation shape."""

from gance_tpu.cli.project_video_to_file import cli

if __name__ == "__main__":
    cli()

"""
Top-level entry stub (reference main.py is an empty stub as well); the real entry
points are the command CLIs: music_into_networks.py, project_video_to_file.py,
synthesize_images.py, process_images.py, check_move_networks.py.
"""


def main() -> None:
    print(__doc__)


if __name__ == "__main__":
    main()

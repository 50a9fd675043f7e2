"""
Dataset/workspace path configuration.

The reference hardcodes personal dataset locations (gance/common_paths.py — an HDD
mount and Raspberry-Pi ownCloud drop directories, used only by the training-set
curation flow). Here the same roles are environment-configurable with sane
defaults, so the curation CLI works on any host.
"""

import os
from pathlib import Path

# Root for curated training datasets (reference: a personal HDD mount).
DATASET_ROOT = Path(os.environ.get("GANCE_TPU_DATASET_ROOT", "./datasets"))

# Incoming capture drop directory (reference: Pi ownCloud sync folders).
CAPTURE_DROP_DIRECTORY = Path(
    os.environ.get("GANCE_TPU_CAPTURE_DROP", str(DATASET_ROOT / "incoming"))
)

# Where curated "good face" selections are copied (select-images-copy default).
GOOD_IMAGES_DIRECTORY = Path(
    os.environ.get("GANCE_TPU_GOOD_IMAGES", str(DATASET_ROOT / "good_images"))
)

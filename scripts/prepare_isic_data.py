"""Resize the ISIC-2017 images to 192x256 (reference scripts/prepare_isic_data.py).

Images resize bilinearly; ground truth and superpixel maps nearest-neighbor.
Processes the Training/Validation/Test_v2 task dirs into ISIC_PREPROCESSED_DIR.
"""
import argparse
import os
import sys

from PIL import Image

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.data.collector import IsicCollector  # noqa: E402

NEW_SIZE_HW = (192, 256)


def process_data(out_dir: str, in_dir_with_task_prefix: str):
    print(f"Process: {os.path.basename(in_dir_with_task_prefix)}")
    collector = IsicCollector(in_dir_with_task_prefix, with_superpixels=True)
    subject_files = collector.get_subject_files()

    out_img_dir = os.path.join(
        out_dir, os.path.basename(in_dir_with_task_prefix) + "_Data")
    out_label_dir = os.path.join(
        out_dir, os.path.basename(in_dir_with_task_prefix) + "_Part1_GroundTruth")
    os.makedirs(out_img_dir, exist_ok=True)
    os.makedirs(out_label_dir, exist_ok=True)

    size_wh = NEW_SIZE_HW[::-1]  # PIL uses (w, h)
    for i, sf in enumerate(subject_files):
        print(f"[{i + 1}/{len(subject_files)}] {sf.subject}", flush=True)
        img_path = sf.categories["images"].entries["image"]
        Image.open(img_path).resize(size_wh, Image.BILINEAR).save(
            os.path.join(out_img_dir, os.path.basename(img_path)))

        gt_path = sf.categories["labels"].entries["gt"]
        Image.open(gt_path).resize(size_wh, Image.NEAREST).save(
            os.path.join(out_label_dir, os.path.basename(gt_path)))

        sp_path = sf.categories["images"].entries.get("superpixels")
        if sp_path:
            Image.open(sp_path).resize(size_wh, Image.NEAREST).save(
                os.path.join(out_img_dir, os.path.basename(sp_path)))


def main(in_root: str = None, out_dir: str = None):
    out_dir = out_dir or dirs.ISIC_PREPROCESSED_DIR
    os.makedirs(out_dir, exist_ok=True)
    task_dirs = ([os.path.join(in_root, d) for d in
                  ("ISIC-2017_Training", "ISIC-2017_Validation",
                   "ISIC-2017_Test_v2")] if in_root else
                 [dirs.ISIC_ORIG_TRAIN_DATA_DIR, dirs.ISIC_ORIG_VALID_DATA_DIR,
                  dirs.ISIC_ORIG_TEST_DATA_DIR])
    for task_dir in task_dirs:
        process_data(out_dir, task_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="ISIC preprocessing (resize)")
    parser.add_argument("--in_root", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args()
    main(args.in_root, args.out_dir)

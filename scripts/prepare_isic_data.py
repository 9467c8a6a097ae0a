"""ISIC-2017 preprocessing: resample every task split to the paper's
192x256 working size (counterpart of reference scripts/prepare_isic_data.py;
output filenames, directory suffixes and pixel semantics are the frozen
contract, the structure is this project's resample-plan table).

The plan below is the whole policy: which collector entry lands in which
sibling directory with which PIL filter. Lesion photographs interpolate
bilinearly; label-valued rasters (ground-truth masks, superpixel index maps)
must stay label-valued, so they resample nearest-neighbor.
"""
import argparse
import os
import sys

from PIL import Image

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, "") and REPO_ROOT not in sys.path:
    # bare-checkout script mode (python scripts/<name>.py); installed, this
    # module is rcu_tpu.tools.<name> and needs no path setup
    sys.path.insert(0, REPO_ROOT)

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.data.collector import IsicCollector  # noqa: E402

TARGET_WH = (256, 192)  # PIL order (w, h) — the paper's 192x256 (h, w)

# (collector category, entry) -> (output dir suffix, PIL resample filter);
# entries missing for a subject (e.g. superpixels) are skipped
RESAMPLE_PLAN = {
    ("images", "image"): ("_Data", Image.BILINEAR),
    ("labels", "gt"): ("_Part1_GroundTruth", Image.NEAREST),
    ("images", "superpixels"): ("_Data", Image.NEAREST),
}


def process_data(out_dir: str, task_dir: str):
    """Resample one task split (its ``_Data``/``_Part1_GroundTruth`` sibling
    dirs) into the same layout under ``out_dir``."""
    task = os.path.basename(task_dir)
    print(f"Process: {task}")
    subject_files = IsicCollector(task_dir,
                                  with_superpixels=True).get_subject_files()
    for suffix, _ in RESAMPLE_PLAN.values():
        os.makedirs(os.path.join(out_dir, task + suffix), exist_ok=True)

    for i, sf in enumerate(subject_files):
        print(f"[{i + 1}/{len(subject_files)}] {sf.subject}", flush=True)
        for (category, entry), (suffix, resample) in RESAMPLE_PLAN.items():
            path = sf.categories[category].entries.get(entry)
            if not path:
                continue
            Image.open(path).resize(TARGET_WH, resample).save(
                os.path.join(out_dir, task + suffix, os.path.basename(path)))


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


def cli():
    parser = argparse.ArgumentParser(description="ISIC preprocessing (resize)")
    parser.add_argument("--in_root", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args()
    main(args.in_root, args.out_dir)


if __name__ == "__main__":
    cli()

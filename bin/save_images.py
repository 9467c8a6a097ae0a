"""Qualitative PNG dumps: image, GT/prediction overlays, inferno uncertainty
maps, bbox-cropped, for the paper's fixed example subjects
(reference bin-analysis/save_images.py).
"""
import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib import colors  # noqa: E402

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.eval import analysis, evaldata as evdata  # noqa: E402

BRATS_SUBJECTS = ["Brats18_TCIA01_390_1", "Brats18_CBICA_AUN_1",
                  "Brats18_CBICA_ASY_1"]
ISIC_SUBJECTS = ["ISIC_0012388", "ISIC_0012654", "ISIC_0012447"]


def get_bbox(img: np.ndarray, margin: int = 5, squared: str = "max"):
    """Bounding box of the non-zero region, optionally squared."""
    nz = np.argwhere(img != 0)
    if nz.size == 0:
        return (slice(None), slice(None))
    (y0, x0), (y1, x1) = nz.min(0), nz.max(0) + 1
    y0, x0 = max(0, y0 - margin), max(0, x0 - margin)
    y1, x1 = min(img.shape[0], y1 + margin), min(img.shape[1], x1 + margin)
    if squared:
        h, w = y1 - y0, x1 - x0
        side = max(h, w) if squared == "max" else min(h, w)
        cy, cx = (y0 + y1) // 2, (x0 + x1) // 2
        y0, y1 = max(0, cy - side // 2), min(img.shape[0], cy + side // 2)
        x0, x1 = max(0, cx - side // 2), min(img.shape[1], cx + side // 2)
    return (slice(y0, y1), slice(x0, x1))


def save_image(arr, path, cmap="gray", norm=None):
    if norm is not None:
        plt.imsave(path, arr, cmap=cmap, vmin=norm.vmin, vmax=norm.vmax)
    else:
        plt.imsave(path, arr, cmap=cmap)


def save_overlay(img, mask, path, color=(1, 0, 0), alpha=0.5):
    fig, ax = plt.subplots()
    ax.imshow(img, cmap="gray")
    cm = colors.LinearSegmentedColormap.from_list("ov", [color, color], N=2)
    ax.imshow(np.ma.masked_where(mask == 0, mask), cmap=cm, alpha=alpha,
              interpolation="none")
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def save_colorbar(path):
    fig, ax = plt.subplots(figsize=(0.4, 4))
    fig.colorbar(plt.cm.ScalarMappable(norm=colors.Normalize(0, 1),
                                       cmap="inferno"), cax=ax)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main(dataset: str, to_plot: list):
    if dataset not in ("brats", "isic"):
        raise ValueError(f'Invalid dataset "{dataset}". Chose "brats" or "isic"')

    if dataset == "brats":
        eval_data_list = evdata.get_brats_eval_data(to_plot)
        subjects = BRATS_SUBJECTS
        min_max_dir = os.path.join(dirs.BRATS_EVAL_DIR, dirs.MINMAX_NAME)
        plot_dir = os.path.join(dirs.BRATS_PLOT_DIR, "images")
        img_key = "flair"
    else:
        eval_data_list = evdata.get_isic_eval_data(to_plot)
        subjects = ISIC_SUBJECTS
        min_max_dir = os.path.join(dirs.ISIC_EVAL_DIR, dirs.MINMAX_NAME)
        plot_dir = os.path.join(dirs.ISIC_PLOT_DIR, "images")
        img_key = "image"

    os.makedirs(plot_dir, exist_ok=True)
    save_colorbar(os.path.join(plot_dir, "colorbar.png"))

    for entry in eval_data_list:
        prepare, id_ = analysis.get_uncertainty_preparation(
            entry, rescale_confidence="subject", rescale_sigma="global",
            min_max_dir=min_max_dir)
        print(id_)
        for sf in (s for s in entry.subject_files if s.subject in subjects):
            subject_dir = os.path.join(plot_dir, sf.subject)
            os.makedirs(subject_dir, exist_ok=True)
            loader = analysis.Loader()
            d = loader.get_data(sf, entry.confidence_entry, images=(img_key,))
            d = prepare(d)

            if dataset == "brats":
                sel = int(np.argmax(d["target"].sum(axis=(1, 2))))
                img = d[img_key][sel]
                gt = d["target"][sel]
                pred = d["prediction"][sel]
                unc = d["uncertainty"][sel]
                slice_str = f"_sl{sel}"
            else:
                img = d[img_key]
                gt, pred, unc = d["target"], d["prediction"], d["uncertainty"]
                slice_str = ""

            bbox = get_bbox(img if img.ndim == 2 else img.sum(-1),
                            squared="max" if dataset == "brats" else "min")
            img_c, gt_c = img[bbox], gt[bbox]
            save_image(img_c, os.path.join(subject_dir,
                                           f"{img_key}{slice_str}.png"))
            save_overlay(img_c, gt_c, os.path.join(
                subject_dir, f"{img_key}_gt_overlay{slice_str}.png"),
                color=(0, 1, 0))
            save_overlay(img_c, pred[bbox], os.path.join(
                subject_dir, f"{entry.id_}_{img_key}_pred_overlay{slice_str}.png"),
                color=(1, 0, 0))
            save_image(unc[bbox], os.path.join(
                subject_dir, f"{entry.id_}_uncert{slice_str}.png"),
                cmap="inferno", norm=colors.Normalize(0.0, 1.0))


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ds", type=str, nargs="?", default="brats")
    parser.add_argument("--ids", type=str, nargs="*",
                        default=["baseline", "baseline_mc", "center",
                                 "center_mc", "ensemble", "auxiliary_feat",
                                 "auxiliary_segm", "aleatoric"])
    args = parser.parse_args()
    main(args.ds, args.ids)


if __name__ == "__main__":
    cli()

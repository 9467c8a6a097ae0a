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


def select_slice(data: dict, dataset: str):
    """The displayed slice: BraTS shows the slice with the LARGEST GT area
    (argmax of per-slice target sums); native-2D ISIC shows the whole image
    (reference bin-analysis/save_images.py:57-62 get_slice_and_str)."""
    if dataset == "isic":
        return slice(None)
    return int(np.argmax(data["target"].sum(axis=(1, 2))))


def get_bbox(img: np.ndarray, squared: str = "max", dims: int = None):
    """Display bounding box of the non-zero region, exactly the reference's
    crop semantics (bin-analysis/save_images.py:151-187 _get_bbox):

    - per axis, [first, last] non-zero index with an ASYMMETRIC margin of
      10 added per side only where it stays inside the image, the upper
      bound staying exclusive-of-last-index when the margin does not fit;
    - ``squared='max'`` (BraTS) PADS every axis outward to the largest
      axis extent (floor-split between the two sides), ``squared='min'``
      (ISIC) SHRINKS every axis inward to the smallest extent;
    - ``dims=2`` restricts to the leading two axes (ISIC images are HxWx3).

    Returns ((h0, h1), (w0, w1)) slice bounds.
    """
    if dims is None:
        dims = img.ndim
    # reduce over all-but-one of the leading `dims` axes; the reference
    # enumerates axis combinations low-to-high, which yields the W range
    # first, then reverses — same net order here, computed directly
    bounds = []
    for keep in range(dims):
        other = tuple(ax for ax in range(dims) if ax != keep)
        nonzero = np.any(img, axis=other) if img.ndim == dims else \
            np.any(img, axis=other + tuple(range(dims, img.ndim)))
        idx = np.where(nonzero)[0]
        lo, hi = int(idx[0]), int(idx[-1])
        if lo - 10 >= 0:
            lo -= 10
        if hi + 10 <= nonzero.shape[0]:
            hi += 10
        bounds.append((lo, hi))
    if squared == "max":
        target = max(hi - lo for lo, hi in bounds)
        for i, (lo, hi) in enumerate(bounds):
            diff = target - (hi - lo)
            bounds[i] = (lo - diff // 2, hi + (diff - diff // 2))
            # deliberate reference parity (save_images.py:56): the reference
            # asserts rather than clamps when the padded box leaves the
            # image, and indexes idx[0] unguarded on all-zero inputs —
            # pinned by tests/test_analysis_parity.py
            assert bounds[i][0] >= 0 and bounds[i][1] < img.shape[i]
    elif squared == "min":
        target = min(hi - lo for lo, hi in bounds)
        for i, (lo, hi) in enumerate(bounds):
            diff = (hi - lo) - target
            bounds[i] = (lo + diff // 2, hi - (diff - diff // 2))
            assert bounds[i][0] >= 0 and bounds[i][1] < img.shape[i]
    return tuple(bounds)


def apply_bbox(img: np.ndarray, bbox):
    (h0, h1), (w0, w1) = bbox
    return img[h0:h1, w0:w1]


def save_image(arr, path, cmap="gray", norm=None):
    arr = np.asarray(arr)
    if arr.ndim == 3 and np.issubdtype(arr.dtype, np.floating):
        # float RGB: clip to [0,1] like the reference's imshow does (it
        # warns and clips; imsave raises)
        arr = np.clip(arr, 0.0, 1.0)
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


def write_subject_images(subject_dir: str, id_: str, img_key: str, d: dict,
                         dataset: str):
    """The per-subject PNG set of reference OutWriterPng.on_new_subject +
    on_test_id (bin-analysis/save_images.py:88-125): image, GT overlay,
    prediction overlay, inferno uncertainty map — slice-selected, bbox-
    cropped, reference filename contract (the slice suffix goes on the
    image/GT files only; its pred/uncert branch tests isinstance(sel, str),
    which never holds — save_images.py:116)."""
    sel = select_slice(d, dataset)
    img = d[img_key][sel]
    gt = d["target"][sel]
    pred = d["prediction"][sel]
    unc = d["uncertainty"][sel]
    slice_str = "" if isinstance(sel, slice) else f"_sl{sel}"

    bbox = get_bbox(img, squared="max", dims=None) \
        if dataset == "brats" else get_bbox(img, squared="min", dims=2)
    img_c, gt_c = apply_bbox(img, bbox), apply_bbox(gt, bbox)
    save_image(img_c, os.path.join(subject_dir, f"{img_key}{slice_str}.png"))
    save_overlay(img_c, gt_c, os.path.join(
        subject_dir, f"{img_key}_gt_overlay{slice_str}.png"),
        color=(0, 1, 0))
    save_overlay(img_c, apply_bbox(pred, bbox), os.path.join(
        subject_dir, f"{id_}_{img_key}_pred_overlay.png"), color=(1, 0, 0))
    # autoscaled like the reference's plain imshow (its uncert_norm is
    # defined but never applied to the uncertainty map)
    save_image(apply_bbox(unc, bbox), os.path.join(
        subject_dir, f"{id_}_uncert.png"), cmap="inferno")


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
            write_subject_images(subject_dir, entry.id_, img_key, d, dataset)


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

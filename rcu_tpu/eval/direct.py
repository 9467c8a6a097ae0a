"""Direct one-pass test+eval: checkpoint -> per-volume fused inference +
calibration/uncertainty eval, with NO intermediate NIfTI artifacts.

The reference pipeline (and our contract-compatible one) stages through disk:
``*_test_*`` writes per-subject NIfTIs, then ``eval_uncertainty`` re-reads
them (bin-dl/brats_test_default.py -> bin-eval/eval_uncertainty.py). That
round-trip costs two gzip passes plus a full host decode per subject. This
module is the production path: each subject's volume streams through ONE
jitted program (:mod:`rcu_tpu.eval.pipeline` factories — inference + ECE
bins + 11-threshold correction) and only the eval CSV rows come back to the
host. CSV schemas are identical to the staged pipeline, so the analysis
layer consumes the output unchanged.

This has no reference counterpart — it exists because the fused TPU program
makes the staging unnecessary.

Coverage — ALL EIGHT reference strategies, volumes (BraTS) and native-2D
chunked (ISIC):
- ``mc`` (baseline_mc/center_mc/cv; the headline) and ``deterministic``
  (baseline/center, ``mc=0``) — entropy protocol;
- ``aleatoric`` (auto-detected sigma head) — two-pass global-rescale sigma
  protocol (``_globalrescale`` result ids);
- ``ensemble`` (stacked member params, EP over a 2-D mesh's 'model' axis) —
  member-mean + entropy protocol (reference brats_test_ensemble.py:72-94);
- ``auxiliary_feat`` (frozen segmenter + PostNet in one program) and
  ``auxiliary_segm`` (error net over images+baseline) — confidence protocol
  with subject rescale (``_rescale`` result ids).
Use the staged pipeline only when the per-subject NIfTI artifacts themselves
are needed.
"""
from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rcu_tpu import directories as dirs
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import databuild
from rcu_tpu.engine.state import init_variables
from rcu_tpu.eval import hooks as ev_hooks
from rcu_tpu.eval import pipeline as pl
from rcu_tpu.eval.actions import CORRECTION_KEYS, csv_value
from rcu_tpu.models import (FAST_DECODER_KWARGS, fold_bn_params,
                            get_model, precast_params)

DEFAULT_THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)

STRATEGIES = ("mc", "deterministic", "aleatoric", "ensemble",
              "auxiliary_feat", "auxiliary_segm")

# result-id suffix + minmax confidence entry per strategy family (the staged
# runner's rescale wiring: eval/actions.py _PASS_BUILDERS)
_ID_SUFFIX = {"mc": "", "deterministic": "", "ensemble": "",
              "aleatoric": "_globalrescale",
              "auxiliary_feat": "_rescale", "auxiliary_segm": "_rescale"}
_CONFIDENCE_ENTRY = {"mc": "probabilities", "deterministic": "probabilities",
                     "ensemble": "probabilities", "aleatoric": "sigma",
                     "auxiliary_feat": "confidence",
                     "auxiliary_segm": "confidence"}


def _load_model_state(model_dir: str, test_at, input_shape,
                      provide_features: bool = False, dtype: str = None,
                      fast_decoder: bool = False, fold_bn: bool = False):
    mf = ckpt_lib.ModelFiles.from_model_dir(model_dir)
    model_node, _ = ckpt_lib.load_model_parameters(mf)
    params_dict = dict(model_node.params)
    if provide_features:
        params_dict["provide_features"] = True
    if dtype:
        # compute-dtype override (e.g. bfloat16 production inference); the
        # CHECKPOINT stays f32 — the loaded state is pre-cast once below
        # (models/unet.precast_params) so dispatches read compute-dtype
        # weights instead of re-casting f32 ones every call
        params_dict["dtype"] = dtype
    if fast_decoder and model_node.type == "unet":
        # concat-free + fused-upsample decoder (models/unet.py): identical
        # param tree, so any unet checkpoint loads; numerics differ only in
        # accumulation order (same opt-in bar as the bf16 compute dtype).
        # Non-unet models (PostNet) have no decoder — silently unaffected.
        params_dict.update(FAST_DECODER_KWARGS)
    model = get_model(model_node.type, params_dict)
    path = ckpt_lib.find_checkpoint_file(mf, test_at)
    if path is None:
        raise FileNotFoundError(f"no checkpoint '{test_at}' in {model_dir}")
    # init with the CHECKPOINT's channel count, not the dataset's — an
    # auxiliary error net takes images+baseline (C+1), a PostNet takes the
    # segmenter's feature channels. Inference needs only the params/BN
    # template, not a TrainState (no optimizer here).
    in_ch = int(params_dict.get("in_channels") or input_shape[-1])
    params_tpl, stats_tpl = init_variables(model, input_shape[:-1] + (in_ch,))
    raw = ckpt_lib.load_checkpoint(path)
    from flax import serialization
    restored = serialization.from_state_dict(
        {"params": params_tpl, "batch_stats": stats_tpl},
        {"params": raw["params"], "batch_stats": raw["batch_stats"]})
    params, batch_stats = restored["params"], restored["batch_stats"]
    if fold_bn:
        # deterministic-inference BN fold (models/unet.fold_bn_params):
        # every BatchNorm folded into its conv in f32 on the host, then the
        # model is rebuilt with fold_bn=True so the program runs no BN op
        # (flax BN's f32 running stats otherwise promote the whole
        # activation to f32 — the measured bf16 single-forward binder).
        # Invalid for MC-dropout protocols — the model guards mc_dropout.
        params, batch_stats = fold_bn_params(params, batch_stats)
        model = model.copy(fold_bn=True)
    # one-time host-side cast to the compute dtype (no-op for f32 models;
    # keeps the f32 sigma/confidence heads and BatchNorm f32): hoists the
    # per-dispatch f32->compute-dtype weight cast out of the program,
    # bitwise-identical to the on-the-fly path (models/unet.precast_params,
    # gated by tests/test_mixed_precision.py::TestPrecastParams)
    params, batch_stats = precast_params(model, params, batch_stats)
    return model, params, batch_stats


def _primary_test_at(config) -> str:
    return "best" if config.test_at in (None, "") else config.test_at


def _calibrated_quant_model(model, state, dataset, transform, is_2d,
                            batch_size, input_dtype, seed,
                            ensemble=False, skip_levels=None):
    """Build the int8 PTQ model for a direct run (``quantize=True``).

    Applies the PLAIN model (same dtype/decoder flags) to one real data
    batch with the ``quant_stats`` collection mutable, converts the sown
    per-site absmax values to activation scales
    (:func:`rcu_tpu.ops.quant.calibrate_scales`), and bakes them into a
    copy of the model as trace-time constants. For the MC protocol,
    calibration runs under one MC-dropout sample so the 1/(1-p) channel
    rescale is inside the calibrated range (the scale margin covers
    mask-to-mask variation).

    ``ensemble=True`` takes stacked member states (leading member axis,
    :func:`rcu_tpu.parallel.ensemble.stack_states` layout) and UNION-
    calibrates: each member runs its own calibration pass (deterministic
    forward — the ensemble protocol has no dropout,
    /root/reference/bin-dl/brats_test_ensemble.py) and per-site scales
    merge by max, so the ONE shared scale dict covers every member's
    activation range. Weights stay per-member: the quantized model
    quantizes each member's kernels at trace time under the member vmap
    (eval/pipeline._ensemble_scan), so only activation scales are shared.

    The calibration batch is the CENTER slice batch of the first test
    subject (BraTS edge slices are often empty — calibrating on them would
    underestimate every site's range), or the first ``batch_size`` images
    on native-2D datasets.

    ``skip_levels`` keeps the N finest resolution levels in the compute
    dtype (models/unet.py ``quant_skip_levels``); None takes the measured
    production default (``ops/quant.DEFAULT_SKIP_LEVELS`` — int8 loses to
    bf16 at the full-resolution small-channel level)."""
    from rcu_tpu.ops import quant as quant_ops
    subjects = dataset.subjects

    def _transformed(img):
        if transform is None:
            return np.asarray(img, np.float32)
        out = transform({"images": np.asarray(img, np.float32),
                         "labels": np.zeros(np.asarray(img).shape[:2],
                                            np.uint8)})
        return np.asarray(out["images"], np.float32)

    if is_2d:
        batch = np.stack([
            _transformed(dataset.read_volume(s, "images"))
            for s in subjects[:max(1, batch_size)]])
    else:
        volume = np.asarray(dataset.read_volume(subjects[0], "images"),
                            np.float32)
        n = min(len(volume), max(1, batch_size))
        lo = max(0, (len(volume) - n) // 2)
        batch = np.stack([_transformed(z) for z in volume[lo:lo + n]])
    batch = batch.astype(input_dtype, copy=False)
    batch = jnp.asarray(batch)
    if ensemble:
        n_members = jax.tree_util.tree_leaves(state[0])[0].shape[0]
        scales: dict = {}
        for m in range(n_members):
            member = jax.tree_util.tree_map(lambda x: x[m], state)
            member_scales = quant_ops.calibrate_scales(
                model, {"params": member[0], "batch_stats": member[1]},
                [batch], mc_dropout=False)
            if scales and set(member_scales) != set(scales):
                raise ValueError(
                    "ensemble members sowed different quant sites — the "
                    "stacked members must share one architecture")
            for key, val in member_scales.items():
                scales[key] = max(scales.get(key, 0.0), val)
        logging.info("int8 union calibration: %d conv sites over %d members "
                     "from subject '%s' (%d items)", len(scales), n_members,
                     subjects[0], len(batch))
    else:
        scales = quant_ops.calibrate_scales(
            model, {"params": state[0], "batch_stats": state[1]},
            [batch], rng=jax.random.PRNGKey(seed),
            # fold_bn models reject mc_dropout traces (and their protocols
            # never sample dropout) — calibrate deterministically; the
            # default keeps the 1/(1-p) dropout-rescale headroom for the
            # mc protocol's scales
            mc_dropout=not getattr(model, "fold_bn", False))
        logging.info("int8 calibration: %d conv sites from subject '%s' "
                     "(%d items)", len(scales), subjects[0], len(batch))
    skip_levels = quant_ops.clamp_skip_levels(model, skip_levels)
    qmodel = model.copy(quant_scales=scales, quant_skip_levels=skip_levels)
    if skip_levels > model.depth:
        # skip covers every level: no site is quantized, so there is nothing
        # to clip-report (clip_report would raise on the empty collection)
        if os.environ.get("RCU_QUANT_CLIP_DEBUG"):
            logging.info("int8 clip report skipped: quantize_skip=%d covers "
                         "all %d levels, no quantized sites", skip_levels,
                         model.depth + 1)
    elif os.environ.get("RCU_QUANT_CLIP_DEBUG"):
        # distribution-shift diagnostic (opt-in: one extra instrumented
        # compile): run the QUANTIZED model on a batch of subjects the
        # calibration never saw, with the quant_clip collection mutable, and
        # log every site's int8 clipped fraction. A silent calibration/eval
        # shift shows up here as a nonzero rate (ops/quant.clip_report).
        if is_2d:
            # calibration used subjects[:batch_size]; probe the disjoint
            # remainder (tail-first). On a dataset too small to leave any
            # held-out subject the probe degenerates to re-reading the
            # calibration batch — say so instead of claiming a shift test.
            held_out = subjects[max(1, batch_size):]
            shift_subjects = held_out[-max(1, batch_size):] \
                or subjects[:max(1, batch_size)]
            shift = np.stack([
                _transformed(dataset.read_volume(s, "images"))
                for s in shift_subjects])
        else:
            shift_subjects = [subjects[-1]]
            volume = np.asarray(
                dataset.read_volume(subjects[-1], "images"), np.float32)
            n = min(len(volume), max(1, batch_size))
            lo = max(0, (len(volume) - n) // 2)
            shift = np.stack([_transformed(z) for z in volume[lo:lo + n]])
        calibration_seen = subjects[0] in shift_subjects if not is_2d \
            else shift_subjects[0] in subjects[:max(1, batch_size)]
        if calibration_seen:
            logging.warning(
                "int8 clip report: dataset too small to hold out a "
                "never-calibrated subject — the probe batch overlaps the "
                "calibration batch and measures no distribution shift")
        shift = jnp.asarray(shift.astype(input_dtype, copy=False))
        member = jax.tree_util.tree_map(lambda x: x[0], state) \
            if ensemble else state
        report = quant_ops.clip_report(
            qmodel, {"params": member[0], "batch_stats": member[1]},
            # fold_bn models reject mc_dropout traces; the ensemble
            # protocol is deterministic by construction
            [shift], mc_dropout=not ensemble
            and not getattr(qmodel, "fold_bn", False),
            rng=jax.random.PRNGKey(seed + 1))
        worst = sorted(report.items(), key=lambda kv: -kv[1])[:5]
        log = logging.warning if worst and worst[0][1] > 0.001 else \
            logging.info
        span = shift_subjects[0] if len(shift_subjects) == 1 else \
            f"{shift_subjects[0]}..{shift_subjects[-1]}"
        log("int8 clip report (%d subject(s) '%s'%s): worst sites %s",
            len(shift_subjects), span, " member 0" if ensemble else "",
            ", ".join(f"{k}={v:.2e}" for k, v in worst))
    return qmodel


def _load_ensemble_states(config, input_shape, dtype=None,
                          fast_decoder=False, fold_bn=False):
    """Primary model (config.model_dir @ config.test_at) + others.model_dir
    members @ others.test_at, stacked on a leading member axis (the protocol
    of strategies.test_ensemble / reference brats_test_ensemble.py:40-50)."""
    model_dirs = config.others.get("model_dir")
    if isinstance(model_dirs, str):
        model_dirs = [model_dirs]
    if not model_dirs or "test_at" not in config.others:
        raise ValueError('missing "model_dir" or "test_at" entry in the '
                         'configuration (others): fill others.model_dir with '
                         'the trained member model dirs')
    member_at = config.others["test_at"]
    all_dirs = ([(config.model_dir, _primary_test_at(config))]
                if config.model_dir else []) \
        + [(d, member_at) for d in model_dirs]
    from rcu_tpu.parallel.ensemble import stack_states
    members, model = [], None
    for i, (model_dir, at) in enumerate(all_dirs):
        logging.info("load ensemble model [%d/%d] %s", i + 1, len(all_dirs),
                     os.path.basename(model_dir))
        model, params, batch_stats = _load_model_state(
            model_dir, at, input_shape, dtype=dtype,
            fast_decoder=fast_decoder, fold_bn=fold_bn)
        members.append((params, batch_stats))
    return (model, stack_states([m[0] for m in members]),
            stack_states([m[1] for m in members]))


def _detect_strategy(config, dataset, strategy):
    """Explicit ``strategy`` wins; otherwise: sigma head -> aleatoric,
    others.model_dir list -> ensemble, others.model_dir str -> auxiliary_feat
    (the frozen segmenter), 2-channel labels -> auxiliary_segm, else mc."""
    if strategy is not None:
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy '{strategy}'; "
                             f"choose one of {STRATEGIES}")
        return strategy
    if config.model_dir:
        mf = ckpt_lib.ModelFiles.from_model_dir(config.model_dir)
        model_node, _ = ckpt_lib.load_model_parameters(mf)
        if model_node.params.get("sigma_out"):
            return "aleatoric"
    member_dirs = config.others.get("model_dir")
    if isinstance(member_dirs, (list, tuple)):
        return "ensemble"
    if isinstance(member_dirs, str):
        # ambiguous config shape: an ensemble listing its single member as a
        # string would be mis-detected here (_load_ensemble_states accepts
        # the string form too) — say which protocol won and why
        logging.warning(
            "others.model_dir is a string (%s) -> inferring strategy "
            "'auxiliary_feat' (frozen-segmenter confidence protocol). If it "
            "is a single ensemble member, pass strategy='ensemble' "
            "explicitly.", member_dirs)
        return "auxiliary_feat"
    # shape-only probe — decoding a whole labels volume just for its trailing
    # dim would cost a full H5 read per run
    shape_of = getattr(dataset, "shape", None)
    labels_shape = tuple(shape_of(dataset.subjects[0], "labels")) if shape_of \
        else np.asarray(dataset.read_volume(dataset.subjects[0],
                                            "labels")).shape
    if len(labels_shape) >= 3 and labels_shape[-1] == 2:
        return "auxiliary_segm"
    return "mc"


_ECE_COLUMNS = ("ece", "dice", "tp", "tn", "fp", "fn", "n")


class _EvalSinks:
    """The direct run's CSV families: calibration bins, the ece_dice row,
    one correction CSV per threshold (result id with the strategy's rescale
    suffix) + the run minmax summary (un-suffixed id, like the staged minmax
    pass).

    ``layout='flat'`` writes every file into ``out_dir`` (the direct CLI's
    own contract); ``layout='eval_tree'`` reproduces the staged eval dir
    layout (``calibration/``, ``ece[_foreground]/``, ``uncertainty/``,
    ``minmax/`` subdirs) so the analysis layer — ResultsData discovery and
    the paper tables — consumes the output with ``base_dir=out_dir`` and no
    file moves."""

    def __init__(self, out_dir, run_id, suffix, thresholds, confidence_entry,
                 layout: str = "flat", masked: bool = True):
        if layout not in ("flat", "eval_tree"):
            raise ValueError(f"unknown layout '{layout}'")

        def sub(name):
            d = out_dir if layout == "flat" else os.path.join(out_dir, name)
            os.makedirs(d, exist_ok=True)
            return d

        self.result_id = run_id + suffix
        self.run_id = run_id
        self.confidence_entry = confidence_entry
        ece_cat = dirs.ECE_FOREGROUND_NAME if masked else dirs.ECE_NAME
        self.calib = ev_hooks.WriteBinsCsvHook(os.path.join(
            sub(dirs.CALIB_NAME),
            dirs.CALIBRATION_PLACEHOLDER.format(self.result_id)))
        self.ece = ev_hooks.WriteCsvHook(
            os.path.join(sub(ece_cat),
                         dirs.ECE_PLACEHOLDER.format(self.result_id)),
            entries=_ECE_COLUMNS)
        self.corr = []
        corr_dir = sub(dirs.UNCERTAINTY_NAME)
        for threshold in thresholds:
            threshold_str = f"{threshold:.2f}".replace(".", "")
            self.corr.append(ev_hooks.WriteCsvHook(os.path.join(
                corr_dir, dirs.UNCERTAINTY_PLACEHOLDER.format(
                    self.result_id, threshold_str)), None))
        self.minmax_path = os.path.join(
            sub(dirs.MINMAX_NAME), dirs.MINMAX_PLACEHOLDER.format(run_id))
        self.bounds = {"min": [], "max": []}
        self.nonfinite = []  # subjects with NaN/inf ECE; finish() raises

    def write_subject(self, subject, row_of):
        """``row_of(key)`` -> numpy value for 'bins_count' etc.; one subject
        (or one image of a 2-D chunk) per call."""
        ece = float(row_of("ece"))
        if not np.isfinite(ece):
            # a constant confidence map (collapsed head: the per-subject
            # min-max rescale divides 0/0, eval/pipeline._confidence_eval)
            # or an empty eval mask (zero binned voxels) yields NaN. Write
            # the row anyway (mirrors the reference's numpy behavior), keep
            # the rest of the run's artifacts, and fail loudly in finish()
            # so one degenerate subject can't silently pass NOR abort a
            # multi-hour run mid-flight
            self.nonfinite.append(subject)
            logging.error(
                "subject '%s': non-finite ECE (%s) from the fused eval — "
                "either the confidence map is constant (collapsed head) or "
                "the subject's eval mask is empty; continuing, finish() "
                "will raise", subject, ece)
        corr = row_of("correction")
        self.calib.on_subject({
            "bins_count": np.asarray(row_of("bins_count")).astype(np.int64),
            "bins_avg_confidence": np.asarray(row_of("bins_avg_confidence")),
            "bins_positive_fraction":
                np.asarray(row_of("bins_positive_fraction")),
            "bins_non_zero": np.asarray(row_of("bins_non_zero")),
            "ece": ece,
            "dice": float(row_of("dice")),
        }, subject, self.result_id)
        self.ece.on_subject({k: csv_value(k, row_of(k))
                             for k in _ECE_COLUMNS}, subject, self.result_id)
        for ti, hook in enumerate(self.corr):
            hook.on_subject({k: csv_value(k, corr[k][ti])
                             for k in CORRECTION_KEYS}, subject,
                            self.result_id)

    def add_bounds(self, mn, mx):
        self.bounds["min"].append(float(mn))
        self.bounds["max"].append(float(mx))

    def finish(self):
        self.calib.on_run_end({}, self.result_id)
        self.ece.on_run_end({}, self.result_id)
        for hook in self.corr:
            hook.on_run_end({}, self.result_id)
        if self.bounds["min"]:
            ev_hooks.WriteSummaryCsvHook(
                self.minmax_path, confidence_entry=self.confidence_entry,
            ).on_run_end(self.bounds, self.run_id)
        if self.nonfinite:
            shown = ", ".join(self.nonfinite[:5])
            more = f" (+{len(self.nonfinite) - 5} more)" \
                if len(self.nonfinite) > 5 else ""
            raise ValueError(
                f"{len(self.nonfinite)} subject(s) produced a non-finite "
                f"ECE: {shown}{more} — either the confidence map was "
                "constant (a collapsed head makes the per-subject min-max "
                "rescale divide 0/0, eval/pipeline._confidence_eval) or the "
                "subject's eval mask selected zero voxels. Every CSV was "
                "still written (NaN rows mark the affected subjects) before "
                "this error was raised.")


def _global_bounds(bounds, what: str):
    gmin, gmax = min(bounds["min"]), max(bounds["max"])
    if not gmax > gmin:
        # a collapsed sigma head would divide 0/0 in the rescale and write
        # NaN into every CSV cell — fail loudly instead
        raise ValueError(
            f"degenerate {what} range [{gmin}, {gmax}] across the run — "
            "the sigma head produced a constant map; the global-rescale "
            "protocol cannot evaluate it")
    return gmin, gmax


def evaluate_direct(config: cfg_lib.TestConfiguration, out_dir: str,
                    run_id: str = "baseline", mc: int = None,
                    thresholds=DEFAULT_THRESHOLDS, mesh=None,
                    masked: bool = True, subject_parallel: bool = False,
                    strategy: str = None, dtype: str = None,
                    layout: str = "flat", dispatch_chunks: int = 4,
                    fast_decoder: bool = False,
                    fold_bn: bool = False,
                    quantize: bool = False,
                    quantize_skip_levels: int = None) -> dict:
    """Run fused inference + eval for every test-split subject, one dispatch
    per volume (or per image chunk on native-2D datasets); write the
    ``eval_calibration_*``, ``eval_ece_*``, ``eval_uncertainty_*_th*`` and
    ``eval_summary_minmax_*`` CSV families into ``out_dir`` (flat by
    default; ``layout='eval_tree'`` reproduces the staged eval-dir layout so
    the analysis tables read ``out_dir`` directly). Returns the per-subject
    ECE dict.

    ``strategy`` picks the protocol explicitly (one of
    :data:`STRATEGIES`); by default it is auto-detected from the checkpoint
    and config (see :func:`_detect_strategy`). ``mc`` counts the MC-dropout
    samples for the ``mc`` strategy (default ``others.mc`` or 20; ``mc=0``
    selects the deterministic baseline protocol). ``dtype='bfloat16'``
    overrides the model's compute dtype (params stay f32) — the production
    configuration, parity-gated at the BASELINE 1e-3 ECE/Dice bar by
    tests/test_bf16_parity.py.

    ``quantize=True`` swaps the trunk convs for the int8 PTQ path
    (ops/quant.py) after a one-batch calibration; ``quantize_skip_levels``
    keeps the N finest resolution levels in the compute dtype (None = the
    measured production default, ops/quant.DEFAULT_SKIP_LEVELS — the
    full-resolution small-channel level is where int8 loses to bf16).

    ``masked=True`` applies the BraTS t2>0 head-support foreground mask,
    derived from the RAW t2 source file recorded in the store's files
    metadata (the stored channels are z-scored, so thresholding them would be
    wrong); ``masked=False`` evaluates unmasked (the ISIC convention).

    Two multi-chip modes with a ``mesh``:
    - latency (default): each volume's work is sharded ACROSS the mesh —
      fastest single-subject answer (a 2-D model x data mesh additionally
      shards ensemble members, EP);
    - throughput (``subject_parallel=True``): whole subjects round-robin onto
      individual mesh devices with params replicated per device; dispatches
      are async so all chips stay busy with zero cross-chip communication —
      fastest full-testset wall clock. Results are identical either way.

    Native-2D datasets (image volume without a slice axis) run CHUNKED:
    ``test_data.batch_size`` whole images per dispatch on the conv batch
    axis, with every image's own eval reductions vmapped in the same program
    (full MXU utilization; K-fold fewer dispatch round trips). For the
    mc/deterministic protocols, ``dispatch_chunks`` further scans that many
    K-image chunks inside ONE dispatch (lax.scan — same device work and
    memory, 1/dispatch_chunks the execute/fetch round trips; matters on
    remote-TPU links, free on co-located hosts). The config's
    transform pipeline is applied per item, exactly as the staged loader
    would.
    """
    if mc is None:
        # honor an explicit others.mc == 0 (the deterministic protocol) —
        # `get("mc") or 20` would silently run 20 MC samples for it
        cfg_mc = config.others.get("mc")
        mc = 20 if cfg_mc is None else int(cfg_mc)
    else:
        mc = int(mc)
    subjects = None
    if config.split:
        from rcu_tpu.data.split import load_split
        _, _, subjects = load_split(config.split, config.others.get("split_k"))
        if not subjects:
            # fail with the cause, not an opaque IndexError in the data
            # builder or a header-only CSV that looks like a successful run
            raise ValueError(
                f"no test subjects: split {config.split!r} has an empty "
                "test set")
    data = databuild.build_data(config.test_data, subjects=subjects,
                                seed=config.seed)
    dataset = data.dataset  # non-empty: build_data guards zero subjects
    transform = databuild.build_transform(config.test_data.transform)

    strategy = _detect_strategy(config, dataset, strategy)
    if strategy == "mc" and mc == 0:
        strategy = "deterministic"
    if fold_bn and strategy == "mc":
        # the BN fold does not commute with the ACTIVE channel dropout
        # between conv and BN (models/unet.fold_bn_params) — the MC
        # protocol keeps flax BN (it is MXU-bound there anyway, not
        # BN-epilogue-bound like the single-forward families)
        raise ValueError(
            "fold_bn covers the deterministic single-forward protocols "
            "(deterministic/ensemble/aleatoric/auxiliary_*); the mc "
            "protocol samples dropout, which the load-time BN fold cannot "
            "commute with")
    if quantize and strategy not in ("mc", "deterministic", "ensemble"):
        # scope: the int8 path covers the mc/deterministic/ensemble family
        # (ensemble via per-member union calibration). aleatoric is excluded
        # by design (the global sigma rescale already breaks the 1e-3 bar
        # for bf16 — tests/test_bf16_parity.py); the auxiliary protocols
        # score a confidence head whose ranges the trunk calibration does
        # not cover.
        raise ValueError(
            f"quantize=True covers the mc/deterministic/ensemble protocols; "
            f"strategy '{strategy}' keeps the f32/bf16 paths")

    # shape probe, not a read_volume: a whole-volume decode (~57 MB for
    # BraTS) just for ndim/shape would cost a full H5 read per run — the
    # same economy _detect_strategy applies
    vol_shape = tuple(dataset.shape(dataset.subjects[0], "images"))
    is_2d = len(vol_shape) == 3  # (H, W, C) — no slice axis (ISIC)
    h, w, in_ch = vol_shape[-3:]
    batch_size = config.test_data.batch_size
    n_data_shards = 1
    if mesh is not None and not subject_parallel:
        # latency mode shards each step's batch axis over the mesh, so it
        # must divide the data-axis device count (throughput mode dispatches
        # whole subjects to single devices and needs no padding)
        from rcu_tpu.parallel.mesh import DATA_AXIS, pad_batch_size_to_mesh
        batch_size = pad_batch_size_to_mesh(batch_size, mesh)
        n_data_shards = dict(mesh.shape).get(DATA_AXIS, 1)

    # ------------------------------------------------------------------ model
    input_shape = (1, h, w, in_ch)
    test_at = _primary_test_at(config)
    model = segm_model = None
    state = ()          # the program's leading parameter-tree args, in order
    member_sharded = ()  # indices of `state` that shard over the model axis
    if strategy == "ensemble":
        model, stacked_params, stacked_stats = _load_ensemble_states(
            config, input_shape, dtype=dtype, fast_decoder=fast_decoder,
            fold_bn=fold_bn)
        state = (stacked_params, stacked_stats)
        member_sharded = (0, 1)
    elif strategy == "auxiliary_feat":
        if not isinstance(config.others.get("model_dir"), str) \
                or "test_at" not in config.others:
            raise ValueError(
                'missing "model_dir" or "test_at" entry in the configuration '
                "(others): auxiliary_feat needs others.model_dir pointing at "
                "the trained frozen-segmenter dir and others.test_at naming "
                "its checkpoint")
        if not config.model_dir:
            raise ValueError(
                "auxiliary_feat needs config.model_dir pointing at the "
                "trained confidence net (PostNet) dir — others.model_dir "
                "names only the frozen segmenter")
        segm_model, segm_params, segm_stats = _load_model_state(
            config.others["model_dir"], config.others["test_at"], input_shape,
            provide_features=True, dtype=dtype, fast_decoder=fast_decoder,
            fold_bn=fold_bn)
        model, post_params, post_stats = _load_model_state(
            config.model_dir, test_at, input_shape, dtype=dtype,
            fast_decoder=fast_decoder, fold_bn=fold_bn)
        state = (segm_params, segm_stats, post_params, post_stats)
    else:
        model, params, batch_stats = _load_model_state(
            config.model_dir, test_at, input_shape, dtype=dtype,
            fast_decoder=fast_decoder, fold_bn=fold_bn)
        state = (params, batch_stats)

    # host-side input cast: under a compute-dtype override the model's first
    # op is x.astype(dtype) (models/unet.py), and numpy's f32->bf16 cast is
    # the same round-to-nearest-even — casting in the loader threads is
    # bit-identical (tests/test_direct_misc.py pins it) and halves the
    # dominant H2D bytes (remote-tunnel H2D measures ~34 MB/s either dtype
    # and does not scale with upload threads: scripts/bench_isic.py)
    input_dtype = jnp.dtype(dtype) if dtype else np.float32

    if quantize:
        # int8 PTQ (ops/quant.py): calibrate per-site activation scales on
        # one real batch, then every program below builds from the quantized
        # model (strategy already validated as mc/deterministic/ensemble;
        # ensemble union-calibrates over the stacked members)
        model = _calibrated_quant_model(model, state, dataset, transform,
                                        is_2d, batch_size, input_dtype,
                                        config.seed,
                                        ensemble=strategy == "ensemble",
                                        skip_levels=quantize_skip_levels)

    aleatoric = strategy == "aleatoric"
    if aleatoric and not getattr(model, "sigma_out", False):
        raise ValueError("strategy 'aleatoric' needs a sigma-headed "
                         f"checkpoint; {config.model_dir} has none")
    is_log_sigma = cfg_lib.require_log_sigma(config) if aleatoric else False

    # throughput mode: whole subjects round-robin onto single devices; each
    # device holds its own replica of the state (no cross-chip traffic)
    devices = list(mesh.devices.flat) if (subject_parallel and mesh is not None) \
        else None
    if devices:
        per_device_state = {
            d: tuple(jax.device_put(t, d) for t in state) for d in devices}
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rcu_tpu.parallel.ensemble import MODEL_AXIS
        rep = NamedSharding(mesh, P())
        member = NamedSharding(mesh, P(MODEL_AXIS)) \
            if MODEL_AXIS in mesh.axis_names else rep
        state = tuple(
            jax.device_put(t, member if i in member_sharded else rep)
            for i, t in enumerate(state))
    program_mesh = None if devices else mesh

    # ---------------------------------------------------------------- loading
    def foreground_mask(subject, shape):
        """BraTS t2>0 head-support mask from the RAW source NIfTI recorded in
        the store's files metadata (eval/analysis.py _get_t2_mask semantics).
        The stored image channels are intensity-normalized, so thresholding
        them would select 'above-mean' voxels, not the head region."""
        from rcu_tpu.data import nifti
        t2_path = (dataset.files(subject) or {}).get("images", {}).get("t2")
        if not t2_path or not os.path.exists(t2_path):
            raise ValueError(
                f"subject '{subject}' has no raw t2 source file recorded in "
                "the store, so the foreground mask cannot be derived (the "
                "stored channels are z-scored). Pass masked=False to "
                "evaluate unmasked, or rebuild the store with files metadata.")
        arr, _ = nifti.read(t2_path)
        fg = np.squeeze(np.asarray(arr)) > 0
        if fg.shape != tuple(shape):
            raise ValueError(
                f"subject '{subject}': raw-t2 mask shape {fg.shape} does not "
                f"match the target shape {tuple(shape)} — the store (or the "
                "config's transform pipeline) changed the geometry relative "
                "to the raw source. Pass masked=False or align geometries.")
        return fg

    needs_baseline = strategy == "auxiliary_segm"

    def _split_labels(labels):
        """-> (target uint8, baseline uint8 or None). Auxiliary-segm labels
        carry [gt, baseline-prediction] on the trailing axis."""
        labels = np.asarray(labels)
        if needs_baseline:
            if labels.shape[-1] != 2:
                raise ValueError(
                    "auxiliary_segm needs [gt, prediction] 2-channel labels; "
                    f"got label shape {labels.shape}")
            gt = (labels[..., 0] > 0.5).astype(np.uint8)
            baseline = (labels[..., 1] > 0.5).astype(np.uint8)
            return gt, baseline
        # spatial rank is (Z,H,W) / (H,W); a trailing channel axis (singleton
        # or [gt, baseline]) drops to the gt channel. No squeeze — it would
        # also collapse a Z=1 slice axis
        if labels.ndim > (2 if is_2d else 3):
            labels = labels[..., 0]
        return (labels > 0.5).astype(np.uint8), None

    # pre-stage host->device transfers in the LOADER threads so uploads
    # overlap the previous dispatch's device work (the dispatch thread would
    # otherwise serialize upload -> execute -> fetch; over the remote-TPU
    # tunnel at ~10-20 MB/s the upload of a decoded volume dominates).
    # Placement matches the dispatch-time target exactly: round-robin device
    # in throughput mode (same si % n_devices the dispatcher uses), the jit
    # in_shardings under a latency mesh, the default device otherwise.
    if devices:
        def _stage(si, arr, data_axis=False):
            return jax.device_put(arr, devices[si % len(devices)])
    elif mesh is not None:
        # the programs' own in_shardings (single source: pipeline.py)
        _rep_sh, _data_sh, _ = pl.staging_shardings(mesh)

        def _stage(si, arr, data_axis=False):
            return jax.device_put(arr, _data_sh if data_axis else _rep_sh)
    else:
        def _stage(si, arr, data_axis=False):
            return jax.device_put(arr)

    def load_subject(si, subject, images_only=False):
        """``images_only`` serves the aleatoric minmax pass (A), whose
        program consumes nothing but the batched volume: it skips the
        labels H5 read, the raw-NIfTI foreground mask, and the
        target/mask/baseline uploads (~2x H*W*Z wasted bytes over an
        H2D-bound link otherwise)."""
        volume = np.asarray(dataset.read_volume(subject, "images"), np.float32)
        labels = None if images_only \
            else np.asarray(dataset.read_volume(subject, "labels"))
        if transform is not None:
            # the staged loader applies transforms per slice item (H,W,C),
            # so spatial transforms (e.g. size) must see slices here too —
            # a whole-volume call would treat Z as the first spatial axis
            dummy = np.zeros(volume.shape[1:3], np.uint8)
            outs = [transform({"images": volume[z],
                               "labels": dummy if images_only
                               else labels[z]})
                    for z in range(volume.shape[0])]
            volume = np.stack(
                [np.asarray(o["images"], np.float32) for o in outs])
            if not images_only:
                labels = np.stack([np.asarray(o["labels"]) for o in outs])
        volume = volume.astype(input_dtype, copy=False)
        nz = volume.shape[0]
        pad = (-nz) % batch_size

        def _batched(arr):
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            return arr.reshape((-1, batch_size) + arr.shape[1:])

        batched = _stage(si, _batched(volume), data_axis=True)
        if images_only:
            return (batched, None, None, None, nz)
        target, baseline = _split_labels(labels)
        mask = foreground_mask(subject, target.shape) if masked \
            else np.ones(target.shape, bool)
        batched_baseline = _stage(si, _batched(baseline), data_axis=True) \
            if baseline is not None else None
        return (batched, batched_baseline, _stage(si, target),
                _stage(si, mask), nz)

    # overlap upcoming subjects' host H5 reads with the current device pass;
    # throughput mode sizes the reader pool with the chip count (one decode
    # thread would bind around 8 devices; h5py's lock caps useful threads)
    import concurrent.futures
    pool_workers = max(1, min(4, len(devices))) if devices else 1
    pool = concurrent.futures.ThreadPoolExecutor(
        pool_workers, thread_name_prefix="direct")

    thresholds_arr = np.asarray(thresholds, np.float32)
    sinks = _EvalSinks(out_dir, run_id, _ID_SUFFIX[strategy], thresholds,
                       _CONFIDENCE_ENTRY[strategy], layout=layout,
                       masked=masked)
    eces = {}
    names = list(dataset.subjects)  # non-empty: guarded at dataset build
    lookahead = pool_workers + 2

    if is_2d:
        return _evaluate_direct_2d(
            strategy, model, segm_model, state, is_log_sigma, dataset, names,
            transform, masked, foreground_mask, needs_baseline, _split_labels,
            mc, batch_size, n_data_shards, thresholds_arr, program_mesh,
            devices, per_device_state if devices else None, config.seed, pool,
            sinks, eces, lookahead, input_dtype, dispatch_chunks)

    # ------------------------------------------------- fused volume programs
    window = 2 * len(devices) if devices else 2  # depth-2 pipeline:
    # overlap the next item's staged upload with the current dispatch's
    # device work and round trips (the 2-D path computes its own)
    needs_rng = strategy in ("mc", "deterministic")
    keys = _host_fold_keys(config.seed, len(names)) if needs_rng else None

    if devices:
        _th = _stage_per_device(thresholds_arr, devices)
    else:
        _th_staged = _stage(0, thresholds_arr)

        def _th(si):
            return _th_staged

    def volume_factory(nz):
        if strategy in ("mc", "deterministic"):
            # artifacts=False: only the eval reductions come back, so no dead
            # per-voxel volumes are held by the async window (or all-gathered
            # across the mesh in latency mode)
            return pl.make_volume_mc_eval_fn(
                model, mc if strategy == "mc" else 0, batch_size, nz,
                mesh=program_mesh, artifacts=False)
        if strategy == "ensemble":
            return pl.make_volume_ensemble_eval_fn(model, batch_size, nz,
                                                   mesh=program_mesh)
        if strategy == "auxiliary_feat":
            return pl.make_volume_aux_feat_eval_fn(segm_model, model,
                                                   batch_size, nz,
                                                   mesh=program_mesh)
        if strategy == "auxiliary_segm":
            return pl.make_volume_aux_segm_eval_fn(model, batch_size, nz,
                                                   mesh=program_mesh)
        return pl.make_volume_aleatoric_eval_fn(model, batch_size, nz,
                                                is_log_sigma,
                                                mesh=program_mesh)

    caches = {"main": {}, "minmax": {}}

    def _fn(kind, factory, nz):
        # one compiled program per true slice count (the padded batch count
        # is ceil(nz/batch_size), derived — not a separate cache dimension)
        if nz not in caches[kind]:
            caches[kind][nz] = factory(nz)
        return caches[kind][nz]

    def _device_args(si, arrays):
        if not devices:
            return state + tuple(arrays)
        dev = devices[si % len(devices)]
        return per_device_state[dev] \
            + tuple(jax.device_put(a, dev) for a in arrays)

    def data_args(si, loaded):
        batched, batched_baseline, target, mask, _nz = loaded
        if needs_baseline:
            return (batched, batched_baseline, target, mask, _th(si))
        return (batched, target, mask, _th(si))

    def fetch(subject, out, t0):
        # one batched D2H for the whole output tree: per-leaf np.asarray
        # costs a round trip per array over a remote-TPU link (~20 leaves
        # x ~30 ms measured), jax.device_get coalesces the tree fetch
        host = jax.device_get(out)
        sinks.write_subject(subject, host.__getitem__)
        if "conf_min" in host:
            sinks.add_bounds(host["conf_min"], host["conf_max"])
        eces[subject] = float(host["ece"])
        logging.info("direct eval %s ece=%.5f (%.2fs)", subject,
                     eces[subject], time.time() - t0)

    if aleatoric:
        # two passes, mirroring the staged sigma run: (A) global min/max of
        # the predicted-class sigma over the whole run (the minmax action),
        # (B) per-subject fused rescale+fold+eval with those bounds
        def minmax_dispatch(si, subject, loaded):
            batched, _bb, _t, _m, nz = loaded
            fn = _fn("minmax",
                     lambda nz_: pl.make_volume_sigma_minmax_fn(
                         model, batch_size, nz_, is_log_sigma,
                         mesh=program_mesh),
                     nz)
            return fn(*_device_args(si, (batched,)))

        def minmax_fetch(subject, out, t0):
            mn, mx = jax.device_get(out)  # one coalesced D2H (see fetch)
            sinks.add_bounds(mn, mx)

        _drive(pool, names,
               lambda si, s: load_subject(si, s, images_only=True),
               minmax_dispatch, minmax_fetch, window, lookahead)
        gmin, gmax = _global_bounds(sinks.bounds, "sigma")
        logging.info("direct aleatoric: global sigma range [%.6f, %.6f]",
                     gmin, gmax)

        # stage the run-global rescale bounds once per target, like _th
        if devices:
            _g = _stage_per_device((np.float32(gmin), np.float32(gmax)),
                                   devices)
        else:
            _g_staged = (_stage(0, np.float32(gmin)),
                         _stage(0, np.float32(gmax)))

            def _g(si):
                return _g_staged

        def al_dispatch(si, subject, loaded):
            batched, _bb, target, mask, nz = loaded
            fn = _fn("main", volume_factory, nz)
            return fn(*_device_args(si, (batched, target, mask, _th(si))),
                      *_g(si))

        _drive(pool, names, load_subject, al_dispatch, fetch, window,
               lookahead)
        pool.shutdown()
        sinks.finish()
        return eces

    def dispatch(si, subject, loaded):
        nz = loaded[4]
        fn = _fn("main", volume_factory, nz)
        args = _device_args(si, data_args(si, loaded))
        if needs_rng:
            return fn(*args, keys[si])
        return fn(*args)

    # dispatches are async: keep up to 2x the device count in flight so every
    # chip stays busy while bounding on-device output memory
    _drive(pool, names, load_subject, dispatch, fetch, window, lookahead)
    pool.shutdown()
    sinks.finish()
    return eces


def _stage_per_device(value, devices):
    """Stage ``value`` (any pytree) once onto every pool device; returns
    ``f(i) -> staged copy`` for dispatch index ``i`` (same round-robin the
    dispatchers use). Dispatch-constant args — thresholds, rescale bounds —
    would otherwise re-upload from numpy on every dispatch."""
    staged = [jax.device_put(value, d) for d in devices]
    return lambda i: staged[i % len(staged)]


def _host_fold_keys(seed: int, n: int) -> np.ndarray:
    """``fold_in(PRNGKey(seed), i)`` for ``i in range(n)`` (one host-CPU
    vmap; see :func:`_host_keys`)."""
    return _host_keys(seed, np.arange(n))


def _host_keys(seed: int, indices: np.ndarray,
               extra_fold: int | None = None) -> np.ndarray:
    """``fold_in(PRNGKey(seed), i)`` rows for ``indices`` — optionally
    folded once more with ``extra_fold`` — computed on the host CPU backend
    in one vmap: threefry bits are backend-invariant (asserted equal to the
    per-index device fold_in by tests/test_direct_misc.py), and a
    per-dispatch ``fold_in`` on the default device is a tiny device program
    whose round trip costs more than the dispatch itself over a remote-TPU
    link. Old-style PRNG keys are plain uint32 ``(2,)`` rows, so the np
    slice feeds the jitted programs unchanged."""
    import contextlib
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        # no CPU backend registered (same guard as engine.state
        # init_variables): one vmapped fold on the default device still
        # beats n per-dispatch round trips
        ctx = contextlib.nullcontext()
    with ctx:
        rng = jax.random.PRNGKey(seed)

        def one(i):
            key = jax.random.fold_in(rng, i)
            if extra_fold is not None:
                key = jax.random.fold_in(key, extra_fold)
            return key

        return np.asarray(jax.vmap(one)(
            jnp.asarray(indices, dtype=jnp.uint32)))


def _host_chunk_keys(seed: int, indices) -> np.ndarray:
    """Final per-chunk MC keys ``fold_in(fold_in(PRNGKey(seed), i), 0)`` for
    an array of global image offsets ``i`` (one vmap on the host CPU
    backend, like :func:`_host_fold_keys`). The historical schedule staged
    ``fold_in(PRNGKey(seed), chunk_offset)`` and let the program fold once
    more with the chunk's position in its dispatch; deriving the second fold
    from the GLOBAL offset instead makes the sampled MC stream invariant to
    ``dispatch_chunks`` grouping (bit-identical to the historical
    one-chunk-per-dispatch stream on homogeneous-shape stores — the ISIC
    protocol's case)."""
    return _host_keys(seed, np.asarray(indices), extra_fold=0)


def _drive(pool, items, load_fn, dispatch_fn, fetch_fn, window: int,
           lookahead: int = 1):
    """Shared async driver for both direct-eval paths: load-ahead
    ``lookahead`` items on the pool's threads (in throughput mode the host
    H5 decode at ~62 Mvox/s/thread would otherwise bind around 8 chips),
    keep up to ``window`` device dispatches in flight, drain in order (jax
    dispatch is async, so the window bounds on-device output buffers
    without stalling the chips). ``load_fn(i, item)`` receives the item's
    dispatch index so it can pre-stage device transfers onto the exact
    target the dispatcher will use. Callers size ``lookahead`` to the reader
    pool width + 2, NOT the full dispatch window — decoded volumes are
    ~200 MB each on the BraTS workload, so buffering 2x-device-count of
    them would cost GBs of host RAM for no extra throughput (the readers,
    not the buffer, are the limit)."""
    import collections
    lookahead = max(1, min(window, lookahead))
    futures = collections.deque(
        pool.submit(load_fn, i, item) for i, item in
        enumerate(items[:lookahead]))
    pending = collections.deque()
    for i, item in enumerate(items):
        t0 = time.time()
        loaded = futures.popleft().result()
        if i + lookahead < len(items):
            futures.append(pool.submit(load_fn, i + lookahead,
                                       items[i + lookahead]))
        out = dispatch_fn(i, item, loaded)
        pending.append((item, out, t0))
        while len(pending) > window:
            fetch_fn(*pending.popleft())
    while pending:
        fetch_fn(*pending.popleft())


def _evaluate_direct_2d(strategy, model, segm_model, state, is_log_sigma,
                        dataset, names, transform, masked, foreground_mask,
                        needs_baseline, split_labels, mc, chunk_size,
                        n_data_shards, thresholds_arr, mesh, devices,
                        per_device_state, seed, pool, sinks, eces, lookahead,
                        input_dtype=np.float32, dispatch_chunks: int = 4):
    """Chunked native-2D eval for every strategy: K images per dispatch
    through the matching :mod:`rcu_tpu.eval.pipeline` image-batch program.
    Latency mode shards the image axis over the mesh; throughput mode
    (``devices``) round-robins whole chunks onto single devices.
    Heterogeneous image sizes split a chunk into same-shape sub-batches (jit
    retraces per shape, like the pre-chunking per-image path did); under a
    latency mesh EVERY sub-batch pads up to a multiple of the mesh's data
    axis so the sharded image axis always divides it."""
    chunk_size = max(1, int(chunk_size))
    aleatoric = strategy == "aleatoric"

    if strategy in ("mc", "deterministic"):
        # one program per scan depth: ``n_chunks`` K-image chunks run inside
        # a single dispatch (lax.scan — zero extra memory), so a remote link
        # pays one execute/fetch round trip per ``dispatch_chunks`` chunks
        # instead of per chunk (the driver_e2e leg of scripts/bench_isic.py)
        _scan_fns = {}

        def _fn_for(n_chunks):
            if n_chunks not in _scan_fns:
                _scan_fns[n_chunks] = pl.make_image_batch_mc_eval_fn(
                    model, mc if strategy == "mc" else 0, mesh=mesh,
                    n_chunks=n_chunks)
            return _scan_fns[n_chunks]

        fn = _fn_for(1)
    elif strategy == "ensemble":
        fn = pl.make_image_batch_ensemble_eval_fn(model, mesh=mesh)
    elif strategy == "auxiliary_feat":
        fn = pl.make_image_batch_aux_feat_eval_fn(segm_model, model,
                                                  mesh=mesh)
    elif strategy == "auxiliary_segm":
        fn = pl.make_image_batch_aux_segm_eval_fn(model, mesh=mesh)
    else:
        fn = pl.make_image_batch_aleatoric_eval_fn(model, is_log_sigma,
                                                   mesh=mesh)
    minmax_fn = pl.make_image_batch_sigma_minmax_fn(
        model, is_log_sigma, mesh=mesh) if aleatoric else None
    needs_rng = strategy in ("mc", "deterministic")

    def load_image(subject, images_only=False):
        """``images_only``: the aleatoric minmax pass consumes nothing but
        the images — skip the labels/mask reads and their uploads (the
        volume path's load_subject has the same fast path)."""
        image = np.asarray(dataset.read_volume(subject, "images"), np.float32)
        labels = np.zeros(image.shape[:2], np.uint8) if images_only \
            else np.asarray(dataset.read_volume(subject, "labels"))
        if transform is not None:
            out_t = transform({"images": image, "labels": labels})
            image = np.asarray(out_t["images"], np.float32)
            labels = np.asarray(out_t["labels"])
        # host-side input cast (see evaluate_direct): halves the dominant
        # tunnel H2D bytes under a bf16 compute dtype, bit-identical to the
        # model's own x.astype(dtype) first op
        image = image.astype(input_dtype, copy=False)
        if images_only:
            return image, None, None, None
        target, baseline = split_labels(labels)
        mask = foreground_mask(subject, target.shape) if masked \
            else np.ones(target.shape, bool)
        return image, target, mask, baseline

    def _pad_len(n, is_last):
        """Sub-batch padding target: the last part rounds up to the full
        chunk (static shape for the common tail-of-run case), every part
        rounds up to the mesh's data-axis size so sharding divides. Under
        the scanning program (mc/deterministic), any part spanning one or
        more chunks pads to WHOLE chunks — the program reshapes to
        (n_chunks, K); sub-chunk mid-run parts keep their small batch under
        n_chunks=1 (padding them to K would waste K-fold forwards on
        heterogeneous stores)."""
        if needs_rng and (n >= chunk_size or is_last):
            return -(-n // chunk_size) * chunk_size
        if is_last:
            return chunk_size
        return -(-n // n_data_shards) * n_data_shards

    # pre-stage H2D in the loader threads onto the exact dispatch target —
    # over the remote-TPU tunnel the ~20 MB chunk upload would otherwise
    # serialize with the device work on the dispatch thread (see the volume
    # path's _stage; measured in scripts/bench_isic.py driver leg)
    if mesh is not None and not devices:
        # the image-batch programs' own in_shardings (source: pipeline.py)
        _rep_sh, _, _data_sh = pl.staging_shardings(mesh)

    def _stage_part(ci, pi, arrays):
        if devices:
            dev = devices[(ci + pi) % len(devices)]  # _dispatch_part's pick
            return {k: jax.device_put(v, dev) for k, v in arrays.items()}
        if mesh is not None:
            return {k: jax.device_put(v, _data_sh)
                    for k, v in arrays.items()}
        return {k: jax.device_put(v) for k, v in arrays.items()}

    def load_chunk(ci, group, images_only=False):
        """-> list of same-shape parts
        [(subjects, staged_arrays, chunk_keys_or_None)]. Padded entries are
        dropped host-side (only real subjects appear in ``subjects``). Each
        mc/deterministic part carries its ``(n_chunks, 2)`` per-chunk key
        array, derived from the chunks' GLOBAL unpadded image offsets
        (group start + within-group part start) — the MC stream therefore
        does not depend on how chunks are grouped into dispatches."""
        quads = [(s, *load_image(s, images_only=images_only))
                 for s in group]
        parts = []
        start = 0
        for i in range(1, len(quads) + 1):
            if i == len(quads) or quads[i][1].shape != quads[start][1].shape:
                same = quads[start:i]
                arrays = {"images": np.stack([t[1] for t in same])}
                if not images_only:
                    arrays["targets"] = np.stack([t[2] for t in same])
                    arrays["masks"] = np.stack([t[3] for t in same])
                if needs_baseline and not images_only:
                    arrays["baselines"] = np.stack([t[4] for t in same])
                padded = _pad_len(len(same), i == len(quads))
                pad = padded - len(same)
                if pad:
                    for key, arr in arrays.items():
                        filler = np.ones if key == "masks" else np.zeros
                        arrays[key] = np.concatenate(
                            [arr, filler((pad,) + arr.shape[1:], arr.dtype)])
                chunk_keys = None
                if needs_rng:
                    # key offsets derive from the part's UNPADDED start in
                    # the run's image order: chunk j of a part with real
                    # length n sits at start+j*K with (m-1)*K < n, so every
                    # chunk's offset is globally unique (padded offsets can
                    # overrun the group span and collide with the next
                    # group's keys, correlating supposedly independent MC
                    # dropout masks)
                    m = max(1, padded // chunk_size)
                    chunk_keys = _host_chunk_keys(
                        seed, group_starts[ci] + start +
                        chunk_size * np.arange(m))
                parts.append(([t[0] for t in same],
                              _stage_part(ci, len(parts), arrays),
                              chunk_keys))
                start = i
        return parts

    # mc/deterministic groups span ``dispatch_chunks`` chunks: the scanning
    # program runs the whole super-group in ONE dispatch (same device work,
    # 1/dispatch_chunks the round trips); other strategies' programs have no
    # scan axis, so they keep one-chunk groups. The tail that doesn't fill a
    # full span splits into ONE-chunk groups: they reuse the universal
    # n_chunks=1 program (shared with every dispatch_chunks config and the
    # persistent compile cache) instead of compiling a tail-sized scan
    # program (a 20-300 s cold remote compile for a few saved round trips).
    group_span = chunk_size * max(1, int(dispatch_chunks)) if needs_rng \
        else chunk_size
    n_full = (len(names) // group_span) * group_span
    group_starts = list(range(0, n_full, group_span)) + \
        list(range(n_full, len(names), chunk_size))
    groups = [names[s:s + (group_span if s < n_full else chunk_size)]
              for s in group_starts]

    # thresholds are identical for every dispatch: stage once per target
    # (the dispatch thread otherwise re-uploads the numpy array per chunk)
    if devices:
        _th_dev = _stage_per_device(thresholds_arr, devices)

        def _th(ci, pi):
            return _th_dev(ci + pi)  # _dispatch_part's device pick
    else:
        _th_staged = jax.device_put(thresholds_arr, _rep_sh) \
            if mesh is not None else jax.device_put(thresholds_arr)

        def _th(ci, pi):
            return _th_staged

    def part_args(arrays, th):
        if needs_baseline:
            return (arrays["images"], arrays["baselines"], arrays["targets"],
                    arrays["masks"], th)
        return (arrays["images"], arrays["targets"], arrays["masks"], th)

    def _dispatch_part(ci, pi, prog, args):
        if devices:
            dev = devices[(ci + pi) % len(devices)]
            return prog(*per_device_state[dev],
                        *(jax.device_put(a, dev) for a in args))
        return prog(*state, *args)

    def dispatch(ci, group, parts, extra=()):
        outs = []
        for pi, (subjects, arrays, chunk_keys) in enumerate(parts):
            args = part_args(arrays, _th(ci, pi)) + tuple(extra)
            prog = fn
            if needs_rng:
                # parts are padded to whole chunks (>= K) or stay sub-chunk
                # (n_chunks=1, smaller batch) — see _pad_len
                prog = _fn_for(max(1, arrays["images"].shape[0]
                               // chunk_size))
                args = args + (chunk_keys,)
            outs.append((subjects, _dispatch_part(ci, pi, prog, args)))
        return outs

    def fetch(group, outs, t0):
        all_ece = []
        for subjects, out in outs:
            # one batched D2H per part (see the volume path's fetch)
            host = jax.device_get(out)
            corr = host.pop("correction")
            for i, subject in enumerate(subjects):
                def row_of(k, i=i):
                    if k == "correction":
                        return {c: v[i] for c, v in corr.items()}
                    return host[k][i]

                sinks.write_subject(subject, row_of)
                if "conf_min" in host:
                    sinks.add_bounds(host["conf_min"][i], host["conf_max"][i])
                eces[subject] = float(host["ece"][i])
                all_ece.append(eces[subject])
        logging.info("direct eval [%s..%s] mean ece=%.5f (%d images, %.2fs)",
                     group[0], group[-1], float(np.mean(all_ece)),
                     len(group), time.time() - t0)

    window = 2 * len(devices) if devices else 2  # depth-2 pipeline:
    # overlap the next item's staged upload with the current
    # dispatch's device work and round trips

    if aleatoric:
        # pass A: per-image sigma bounds -> the run's global rescale range
        def minmax_dispatch(ci, group, parts):
            outs = []
            for pi, (subjects, arrays, _keys) in enumerate(parts):
                outs.append((subjects, _dispatch_part(
                    ci, pi, minmax_fn, (arrays["images"],))))
            return outs

        def minmax_fetch(group, outs, t0):
            for subjects, (mn, mx) in outs:
                mn, mx = jax.device_get((mn, mx))  # one batched D2H
                for i in range(len(subjects)):  # padded tails never counted
                    sinks.add_bounds(mn[i], mx[i])

        _drive(pool, groups,
               lambda ci, g: load_chunk(ci, g, images_only=True),
               minmax_dispatch, minmax_fetch, window, lookahead)
        gmin, gmax = _global_bounds(sinks.bounds, "sigma")
        logging.info("direct 2d aleatoric: global sigma range [%.6f, %.6f]",
                     gmin, gmax)
        _drive(pool, groups, load_chunk,
               lambda ci, group, parts: dispatch(
                   ci, group, parts,
                   extra=(np.float32(gmin), np.float32(gmax))),
               fetch, window, lookahead)
    else:
        _drive(pool, groups, load_chunk, dispatch, fetch, window, lookahead)

    pool.shutdown()
    sinks.finish()
    return eces

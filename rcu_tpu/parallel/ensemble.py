"""Fused ensemble training: all K members as ONE pjit program on a 2-D mesh.

The reference trains its 10-member ensemble as 10 separate sequential jobs
(config/train_ensemble/, SURVEY §2.7 P2). TPU-native mapping: stack member
params on a leading axis, vmap the train step over it, and lay the member axis
over the mesh's 'model' axis and the batch axis over 'data' — K members × B
batch train simultaneously, gradients all-reduced only within each member's
data shards. This is EP-style parallelism for the ensemble axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


def make_ensemble_mesh(n_model: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by {n_model} members")
    arr = np.asarray(devices).reshape(n_model, n // n_model)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def stack_states(states):
    """Stack per-member TrainStates on a leading member axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *states)


def make_vmapped_ensemble_train_step(train_step_fn):
    """vmap a (state, batch, rng) -> (state, metrics) step over the member axis.

    ``batch`` gains a leading member axis too (each member sees its own data —
    the jackknife splits of the reference's k10 ensembles)."""
    return jax.vmap(train_step_fn)


def shard_ensemble_train_step(vmapped_step, mesh: Mesh, donate: bool = True):
    """jit the vmapped step over the 2-D mesh: member axis on 'model', batch
    axis on 'data', per-member state sharded over 'model' only.

    The member axis is mapped with an EXPLICIT ``shard_map`` (each model-axis
    shard runs its local members' full train step; the per-member batch axis
    stays a compiler-sharded GSPMD dimension, so gradient/BN reductions over
    'data' are inserted by XLA exactly like the proven 1-D DP path). Explicit
    because letting GSPMD partition the vmapped member axis of conv chains
    miscompiles on this jax/XLA build — measured round 4: member-sharded
    chained convs return O(1)-wrong values while each conv is exact in
    isolation (tests/test_parallel.py TestEnsembleParallel pins the fixed
    equality bitwise-tight)."""
    state_sh = NamedSharding(mesh, P(MODEL_AXIS))
    batch_sh = NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS))
    rng_sh = NamedSharding(mesh, P(MODEL_AXIS))
    member = P(MODEL_AXIS)

    def step(stacked_state, stacked_batch, rngs):
        return jax.shard_map(vmapped_step, mesh=mesh,
                             axis_names=frozenset({MODEL_AXIS}),
                             in_specs=(member, member, member),
                             out_specs=(member, member))(
            stacked_state, stacked_batch, rngs)

    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate else (),
    )


def shard_ensemble_predict_fn(model, mesh: Mesh, do_mi: bool = False,
                              do_var: bool = False):
    """EP x DP ensemble inference on a 2-D mesh: member params sharded over
    'model', batches sharded over 'data'. Each device holds K/n_model member
    replicas and computes their forwards on its batch shard; the member-mean
    is one psum over the 'model' axis. Replaces the reference's sequential
    member loop (bin-dl/brats_test_ensemble.py:84-94) at multi-chip scale;
    the member count must divide the 'model' axis.

    The member axis is an EXPLICIT shard_map (GSPMD-partitioning a vmapped
    member conv chain miscompiles on this build — see
    shard_ensemble_train_step). MI/variance use the psum moment identities
    (sum of per-member entropies; E[p^2]-E[p]^2), numerically equal to
    steps.multi_prediction_summary within f32 roundoff."""
    import jax.numpy as jnp

    from rcu_tpu.ops import metrics as metrics_lib

    member_sh = NamedSharding(mesh, P(MODEL_AXIS))
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    member = P(MODEL_AXIS)

    def predict(stacked_params, stacked_batch_stats, batch):
        n_members = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

        def body(local_params, local_stats, local_batch):
            images = local_batch["images"]

            def one(params, batch_stats):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats}, images,
                    train=False)
                return jax.nn.softmax(out.logits, axis=-1)

            local_probs = jax.vmap(one)(local_params, local_stats)
            probabilities = jax.lax.psum(jnp.sum(local_probs, axis=0),
                                         MODEL_AXIS) / n_members
            out = {"probabilities": probabilities,
                   "entropy": metrics_lib.entropy(probabilities, axis=-1)}
            if do_mi:
                expected_entropy = jax.lax.psum(
                    jnp.sum(metrics_lib.entropy(local_probs, axis=-1),
                            axis=0), MODEL_AXIS) / n_members
                out["mutual_info"] = out["entropy"] - expected_entropy
            if do_var:
                sum_sq = jax.lax.psum(jnp.sum(jnp.square(local_probs),
                                              axis=0), MODEL_AXIS)
                var = jnp.maximum(
                    sum_sq / n_members - jnp.square(probabilities), 0.0)
                out["variance"] = jnp.mean(var, axis=-1)
            return out

        return jax.shard_map(body, mesh=mesh,
                             axis_names=frozenset({MODEL_AXIS}),
                             in_specs=(member, member, P()),
                             out_specs=P())(stacked_params,
                                            stacked_batch_stats, batch)

    return jax.jit(predict, in_shardings=(member_sh, member_sh, batch_sh),
                   out_shardings=batch_sh)


def train_ensemble_fused(configs, mesh: Mesh = None):
    """Train ALL ensemble members as one program (replaces K sequential
    reference jobs, config/train_ensemble/). Each member keeps its own
    jackknife data (``others.split_k``), run dir, checkpoints, best tracking —
    the artifacts are indistinguishable from K separate runs, so
    ``strategies.test_ensemble`` consumes them unchanged.

    ``configs``: list of TrainConfiguration (one per member; same model/
    optimizer settings required). Returns the list of per-member TrainLoop-like
    records with ``model_files`` populated.
    """
    import logging
    import os

    import jax.numpy as jnp

    from rcu_tpu.data.loader import prefetch
    from rcu_tpu.engine import checkpoint as ckpt_lib
    from rcu_tpu.engine import config as cfg_lib
    from rcu_tpu.engine import databuild, steps as steps_lib
    from rcu_tpu.engine.state import create_train_state
    from rcu_tpu.models import get_model, get_optimizer
    from rcu_tpu.utils import ids as ids_lib
    from rcu_tpu.utils import logs as logs_lib

    k = len(configs)
    first = configs[0]
    for cfg in configs[1:]:
        if cfg.model.params != first.model.params:
            raise ValueError("fused ensemble members must share the model config")
        # the fused step uses the FIRST config's optimizer/epochs for every
        # member; a silently-ignored difference would write per-member
        # config.yamls claiming hyperparameters that were never used
        if (cfg.optimizer.type, cfg.optimizer.params) != \
                (first.optimizer.type, first.optimizer.params):
            raise ValueError("fused ensemble members must share the "
                             "optimizer config (train divergent members as "
                             "separate runs)")
        if cfg.epochs != first.epochs:
            raise ValueError("fused ensemble members must share epochs; got "
                             f"{cfg.epochs} vs {first.epochs}")
    names = [(cfg.train_dir, cfg.train_name) for cfg in configs]
    if len(set(names)) != len(names):
        # all members are created within the same second, so the run id does
        # not disambiguate — identical names would interleave checkpoints in
        # ONE directory and silently corrupt every member involved
        raise ValueError("fused ensemble members must have distinct "
                         "train_name values per train_dir; got "
                         f"{[n for _, n in names]}")

    model = get_model(first.model.type, first.model.params)
    optimizer = get_optimizer(first.optimizer.type, first.optimizer.params)
    raw_step = steps_lib.make_train_step(model, optimizer, donate=False)
    inner = raw_step.__wrapped__ if hasattr(raw_step, "__wrapped__") else raw_step
    vstep = make_vmapped_ensemble_train_step(inner)
    step = shard_ensemble_train_step(vstep, mesh) if mesh is not None \
        else jax.jit(vstep, donate_argnums=(0,))

    # per-member run dirs + data
    class MemberRun:
        pass

    members = []
    for i, cfg in enumerate(configs):
        m = MemberRun()
        m.config = cfg
        m.run_id = ids_lib.unique_identifier()
        m.run_dir = os.path.join(cfg.train_dir, f"{m.run_id}_{cfg.train_name}")
        m.model_files = ckpt_lib.ModelFiles.create(m.run_dir, m.run_id)
        os.makedirs(m.run_dir, exist_ok=True)
        cfg_lib.save(cfg, os.path.join(m.run_dir, "config.yaml"))
        ckpt_lib.backup_model_parameters(m.model_files, cfg.model, cfg.optimizer)
        train_subjects = valid_subjects = None
        if cfg.split:
            from rcu_tpu.data.split import load_split
            train_subjects, valid_subjects, _ = load_split(
                cfg.split, cfg.others.get("split_k"))
        bs = cfg.train_data.batch_size
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            bs = -(-bs // n_data) * n_data  # pad to the data axis
        m.train_data = databuild.build_data(cfg.train_data,
                                            subjects=train_subjects,
                                            seed=cfg.seed + i, batch_size=bs)
        m.valid_data = databuild.build_data(cfg.valid_data,
                                            subjects=valid_subjects,
                                            seed=cfg.seed)
        m.best_score = None
        m.saved_epochs = []
        members.append(m)
    logs_lib.setup_logging(members[0].run_dir)

    sample = next(iter(members[0].train_data.loader))
    h, w = sample["images"].shape[1:3]
    in_ch = getattr(model, "in_channels", 0) or sample["images"].shape[-1]
    states = [create_train_state(model, optimizer, (1, h, w, in_ch),
                                 jax.random.PRNGKey(cfg.seed + i))
              for i, cfg in enumerate(configs)]
    stacked = jax.device_put(stack_states(states))

    predict = steps_lib.make_predict_fn(model)
    root_key = jax.random.PRNGKey(first.seed)
    epochs = first.epochs
    nb_steps = min(m.train_data.nb_batches for m in members)

    for epoch in range(epochs):
        for m in members:
            m.train_data.loader.set_epoch(epoch)
        iters = [iter(prefetch(iter(m.train_data.loader))) for m in members]
        epoch_key = jax.random.fold_in(root_key, epoch)
        loss = None
        for i in range(nb_steps):
            batch = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[next(it) for it in iters])
            rngs = jax.random.split(jax.random.fold_in(epoch_key, i), k)
            stacked, metrics = step(stacked, batch, rngs)
            loss = metrics["loss"]
        logging.info("fused ensemble epoch %d/%d losses %s", epoch + 1, epochs,
                     np.asarray(loss) if loss is not None else "-")

        # per-member validation + checkpointing (host side, sequential)
        member_states = [
            jax.tree_util.tree_map(lambda x, idx=i: np.asarray(x[idx]), stacked)
            for i in range(k)]
        for i, m in enumerate(members):
            score = _validate_member(model, predict, member_states[i],
                                     m.valid_data)
            payload = {"params": member_states[i].params,
                       "batch_stats": member_states[i].batch_stats,
                       "opt_state": member_states[i].opt_state,
                       "epoch": epoch,
                       "best_score": np.float32(score)}
            if m.best_score is None or score > m.best_score:
                m.best_score = score
                prev = ckpt_lib.find_best_checkpoint_epoch(m.model_files)
                if prev is not None:
                    ckpt_lib.delete_checkpoint(m.model_files, prev, best=True)
                ckpt_lib.save_checkpoint(m.model_files, payload, epoch, best=True)
            ckpt_lib.save_checkpoint(m.model_files, payload, epoch)
            m.saved_epochs.append(epoch)
            while len(m.saved_epochs) > 3:
                ckpt_lib.delete_checkpoint(m.model_files, m.saved_epochs.pop(0))
            logging.info("  member %d: valid score %.4f (best %.4f)", i, score,
                         m.best_score)
    return members


def _validate_member(model, predict, state, valid_data):
    """Mean subject dice of one member over its valid loader."""
    from rcu_tpu.data.assembler import Subject2dAssembler, SubjectAssembler
    from rcu_tpu.engine import databuild
    from rcu_tpu.ops import metrics as metrics_lib

    asm_cls = SubjectAssembler if any(
        idx[1] >= 0 for idx in valid_data.loader.indices[:1]) else Subject2dAssembler
    asm = asm_cls(valid_data.dataset, ("probabilities",))
    scores = []
    for batch in valid_data.loader:
        out = predict(state.params, state.batch_stats, batch)
        asm.add_batch({"probabilities": np.asarray(out["probabilities"])},
                      batch["subject_index"], batch["slice_index"], batch["valid"])
        for si in asm.subjects_ready():
            data = asm.get_assembled_subject(si)
            info = databuild.direct_subject_info(valid_data.dataset, si)
            prediction = np.argmax(data["probabilities"], axis=-1)
            target = np.squeeze(np.asarray(info["labels"]))
            if target.ndim > prediction.ndim:
                target = target[..., 0]
            scores.append(float(np.asarray(metrics_lib.dice(
                prediction, (target > 0.5).astype(np.uint8)))))
    return float(np.mean(scores)) if scores else float("-inf")

"""Fused whole-volume MC+eval program vs the composed per-batch path."""
import jax
import jax.numpy as jnp
import numpy as np

from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.engine.state import create_train_state
from rcu_tpu.eval import kernels, pipeline
from rcu_tpu.models import get_model, get_optimizer
from rcu_tpu.ops.uncertainty import correction_eval
from rcu_tpu.parallel import mesh as mesh_lib

MC_T, BATCH, VOL, HW, CH = 3, 4, 7, 16, 2
THRESHOLDS = np.asarray([0.05, 0.5, 0.95], np.float32)


def setup():
    model = get_model("unet", dict(nb_classes=2, in_channels=CH, depth=2,
                                   start_filters=4, dropout=0.2))
    optimizer = get_optimizer("adam", {"lr": 1e-3})
    state = create_train_state(model, optimizer, (1, HW, HW, CH),
                               jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    pad = (-VOL) % BATCH
    volume = rng.rand(VOL + pad, HW, HW, CH).astype(np.float32)
    target = (rng.rand(VOL, HW, HW) > 0.5).astype(np.uint8)
    mask = rng.rand(VOL, HW, HW) > 0.2
    return model, state, volume, target, mask


def composed_path(model, state, volume, target, mask, key):
    """Per-batch MC predict + separate eval kernels (the loop the fused
    program replaces), same fold_in key schedule."""
    predict = steps_lib.make_mc_predict_fn(model, MC_T)
    n_batches = volume.shape[0] // BATCH
    fg_parts, ent_parts = [], []
    for i in range(n_batches):
        images = volume[i * BATCH:(i + 1) * BATCH]
        out = predict(state.params, state.batch_stats, {"images": images},
                      jax.random.fold_in(key, i))
        fg_parts.append(out["probabilities"][..., 1])
        ent_parts.append(out["entropy"])
    fg = jnp.concatenate(fg_parts)[:VOL]
    ent = jnp.concatenate(ent_parts)[:VOL] / jnp.log(2.0)
    prediction = fg > 0.5
    ece_out = kernels.calibration_bins(fg, target, prediction, mask)
    corr = correction_eval(prediction, target, ent, THRESHOLDS)
    return ece_out, corr, fg, ent


class TestFusedVolumePipeline:
    def test_matches_composed_path(self):
        model, state, volume, target, mask = setup()
        key = jax.random.PRNGKey(21)
        ece_out, corr, fg, ent = composed_path(model, state, volume, target,
                                               mask, key)

        fused = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL)
        batched = volume.reshape(-1, BATCH, HW, HW, CH)
        got = fused(state.params, state.batch_stats, batched, target, mask,
                    THRESHOLDS, key)

        np.testing.assert_allclose(np.asarray(got["fg"]), np.asarray(fg),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(got["ece"]), float(ece_out["ece"]),
                                   rtol=1e-5)
        for k in ("bins_count", "bins_avg_confidence"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ece_out[k]), rtol=1e-5)
        for k in ("corrected_dice", "tpu", "fpu"):
            np.testing.assert_allclose(np.asarray(got["correction"][k]),
                                       np.asarray(corr[k]), rtol=1e-5)

    def test_sharded_matches_single_device(self):
        model, state, volume, target, mask = setup()
        key = jax.random.PRNGKey(5)
        batched = volume.reshape(-1, BATCH, HW, HW, CH)

        single = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL)
        ref = single(state.params, state.batch_stats, batched, target, mask,
                     THRESHOLDS, key)

        mesh = mesh_lib.make_mesh(n_devices=4)  # batch 4 shards over 4 devs
        from rcu_tpu.parallel.inference import replicate_tree
        rstate = replicate_tree(state, mesh)
        sharded = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL,
                                                  mesh=mesh)
        got = sharded(rstate.params, rstate.batch_stats, batched, target,
                      mask, THRESHOLDS, key)
        np.testing.assert_allclose(float(ref["ece"]), float(got["ece"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ref["fg"]),
                                   np.asarray(got["fg"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ref["correction"]["corrected_dice"]),
            np.asarray(got["correction"]["corrected_dice"]), rtol=1e-5)


class TestArtifactFreeProgram:
    def test_reductions_match_and_volumes_dropped(self):
        """artifacts=False returns identical eval reductions with none of the
        per-voxel volume outputs (the direct CSV path's memory shape)."""
        model, state, volume, target, mask = setup()
        key = jax.random.PRNGKey(5)
        batched = volume.reshape(-1, BATCH, HW, HW, CH)
        full = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL)(
            state.params, state.batch_stats, batched, target, mask,
            THRESHOLDS, key)
        lean = pipeline.make_volume_mc_eval_fn(
            model, MC_T, BATCH, VOL, artifacts=False)(
            state.params, state.batch_stats, batched, target, mask,
            THRESHOLDS, key)
        assert set(lean) == set(full) - {"fg", "entropy", "ws_fg"}
        np.testing.assert_allclose(np.asarray(lean["ece"]),
                                   np.asarray(full["ece"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lean["correction"]["corrected_dice"]),
            np.asarray(full["correction"]["corrected_dice"]), rtol=1e-6)

    def test_inference_only_program_matches_eval_variant(self):
        """make_volume_mc_fn (the serving path) shares the MC scan with the
        eval variant bitwise — same PRNG schedule, same fg/entropy."""
        model, state, volume, target, mask = setup()
        key = jax.random.PRNGKey(6)
        batched = volume.reshape(-1, BATCH, HW, HW, CH)
        evald = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL)(
            state.params, state.batch_stats, batched, target, mask,
            THRESHOLDS, key)
        plain = pipeline.make_volume_mc_fn(model, MC_T, BATCH, VOL)(
            state.params, state.batch_stats, batched, key)
        np.testing.assert_array_equal(np.asarray(plain["fg"]),
                                      np.asarray(evald["fg"]))
        np.testing.assert_array_equal(np.asarray(plain["entropy"]),
                                      np.asarray(evald["entropy"]))


class TestImageBatchProgram:
    def test_per_image_reductions_match_manual(self):
        """The chunked native-2D program's per-image ece/dice/correction must
        equal computing each image's reductions from the same MC pass."""
        from rcu_tpu.engine.steps import mc_forward
        model, state, volume, _, _ = setup()
        K = 4
        rng = np.random.RandomState(7)
        images = volume[:K]
        targets = (rng.rand(K, HW, HW) > 0.5).astype(np.uint8)
        masks = rng.rand(K, HW, HW) > 0.2
        key = jax.random.PRNGKey(13)
        fn = pipeline.make_image_batch_mc_eval_fn(model, MC_T)
        got = fn(state.params, state.batch_stats, images, targets, masks,
                 THRESHOLDS, key)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # same MC pass: scan of 1 step -> fold_in(key, 0)
        probs = mc_forward(model, variables, images,
                           jax.random.fold_in(key, 0), MC_T)
        from rcu_tpu.ops.metrics import entropy as entropy_op
        fg = jnp.mean(probs, axis=0)[..., 1]
        ent = entropy_op(jnp.mean(probs, axis=0), axis=-1) / jnp.log(2.0)
        for i in range(K):
            ece_out = kernels.calibration_bins(fg[i], targets[i],
                                               fg[i] > 0.5, masks[i])
            np.testing.assert_allclose(float(np.asarray(got["ece"])[i]),
                                       float(np.asarray(ece_out["ece"])),
                                       rtol=1e-5, atol=1e-7)
            corr = correction_eval(fg[i] > 0.5, targets[i], ent[i], THRESHOLDS)
            np.testing.assert_allclose(
                np.asarray(got["correction"]["corrected_dice"])[i],
                np.asarray(corr["corrected_dice"]), rtol=1e-5, atol=1e-7)
            np.testing.assert_array_equal(
                np.asarray(got["correction"]["tp"])[i],
                np.asarray(corr["tp"]))

    def test_sharded_matches_single_device(self):
        model, state, volume, _, _ = setup()
        K = 4
        rng = np.random.RandomState(8)
        images = volume[:K]
        targets = (rng.rand(K, HW, HW) > 0.5).astype(np.uint8)
        masks = np.ones((K, HW, HW), bool)
        key = jax.random.PRNGKey(4)
        single = pipeline.make_image_batch_mc_eval_fn(model, MC_T)(
            state.params, state.batch_stats, images, targets, masks,
            THRESHOLDS, key)
        mesh = mesh_lib.make_mesh(n_devices=2)
        sharded = pipeline.make_image_batch_mc_eval_fn(model, MC_T, mesh=mesh)(
            state.params, state.batch_stats, images, targets, masks,
            THRESHOLDS, key)
        np.testing.assert_allclose(np.asarray(sharded["ece"]),
                                   np.asarray(single["ece"]),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(sharded["correction"]["tp"]),
            np.asarray(single["correction"]["tp"]))

    def test_multi_chunk_scan_matches_single_chunks(self):
        """n_chunks>1 scans G K-image chunks in one dispatch; chunk i uses
        fold_in(rng, i) — chunk 0 therefore matches the single-chunk program
        bitwise, and with mc=0 (rng-free deterministic protocol) EVERY chunk
        matches its own single-chunk dispatch."""
        model, state, volume, _, _ = setup()
        K, G = 4, 2
        rng = np.random.RandomState(9)
        images = np.concatenate([volume[:K], volume[K:2 * K]])
        targets = (rng.rand(G * K, HW, HW) > 0.5).astype(np.uint8)
        masks = np.ones((G * K, HW, HW), bool)
        key = jax.random.PRNGKey(6)

        multi = pipeline.make_image_batch_mc_eval_fn(model, MC_T, n_chunks=G)(
            state.params, state.batch_stats, images, targets, masks,
            THRESHOLDS, key)
        single = pipeline.make_image_batch_mc_eval_fn(model, MC_T)(
            state.params, state.batch_stats, images[:K], targets[:K],
            masks[:K], THRESHOLDS, key)
        np.testing.assert_allclose(np.asarray(multi["ece"])[:K],
                                   np.asarray(single["ece"]),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(
            np.asarray(multi["correction"]["tp"])[:K],
            np.asarray(single["correction"]["tp"]))

        # explicit (n_chunks, 2) per-chunk keys: rngs[i] replaces
        # fold_in(rng, i), so stacking the folds reproduces the single-key
        # program bitwise (the direct driver's dispatch-invariant form)
        stacked_keys = np.stack(
            [np.asarray(jax.random.fold_in(key, i)) for i in range(G)])
        explicit = pipeline.make_image_batch_mc_eval_fn(model, MC_T,
                                                        n_chunks=G)(
            state.params, state.batch_stats, images, targets, masks,
            THRESHOLDS, stacked_keys)
        np.testing.assert_array_equal(np.asarray(multi["ece"]),
                                      np.asarray(explicit["ece"]))

        det_multi = pipeline.make_image_batch_mc_eval_fn(model, 0, n_chunks=G)(
            state.params, state.batch_stats, images, targets, masks,
            THRESHOLDS, key)
        det_single_fn = pipeline.make_image_batch_mc_eval_fn(model, 0)
        for g in range(G):
            sl = slice(g * K, (g + 1) * K)
            det_single = det_single_fn(
                state.params, state.batch_stats, images[sl], targets[sl],
                masks[sl], THRESHOLDS, key)
            np.testing.assert_allclose(np.asarray(det_multi["ece"])[sl],
                                       np.asarray(det_single["ece"]),
                                       rtol=1e-6, atol=1e-8)
            np.testing.assert_allclose(
                np.asarray(det_multi["correction"]["corrected_dice"])[sl],
                np.asarray(det_single["correction"]["corrected_dice"]),
                rtol=1e-6, atol=1e-8)


class TestAuxPredictUnderMesh:
    def test_aux_feat_sharded_matches_single_device(self):
        segm = get_model("unet", dict(nb_classes=2, in_channels=CH, depth=2,
                                      start_filters=4, dropout=0.1,
                                      provide_features=True))
        post = get_model("postnet", dict(in_channels=4, nb_classes=2))
        opt = get_optimizer("adam", {"lr": 1e-3})
        s_state = create_train_state(segm, opt, (1, HW, HW, CH),
                                     jax.random.PRNGKey(0))
        p_state = create_train_state(post, opt, (1, HW, HW, 4),
                                     jax.random.PRNGKey(1))
        batch = {"images": np.random.RandomState(2)
                 .rand(8, HW, HW, CH).astype(np.float32)}

        plain = steps_lib.make_auxiliary_feat_predict_fn(segm, post)
        ref = plain(s_state.params, s_state.batch_stats,
                    p_state.params, p_state.batch_stats, batch)

        mesh = mesh_lib.make_mesh()
        sharded = steps_lib.make_auxiliary_feat_predict_fn(segm, post,
                                                           mesh=mesh)
        got = sharded(s_state.params, s_state.batch_stats,
                      p_state.params, p_state.batch_stats, batch)
        for key in ("probabilities", "segm_probabilities", "confidence"):
            np.testing.assert_allclose(np.asarray(ref[key]),
                                       np.asarray(got[key]),
                                       rtol=1e-4, atol=1e-5)


class TestBf16EceParity:
    def test_bf16_pipeline_ece_within_gate(self):
        """bf16 compute dtype keeps the fused pipeline's ECE within the
        BASELINE.json 1e-3 parity gate vs f32 on the same weights/keys."""
        model_f32 = get_model("unet", dict(nb_classes=2, in_channels=CH,
                                           depth=2, start_filters=4,
                                           dropout=0.2))
        model_bf16 = get_model("unet", dict(nb_classes=2, in_channels=CH,
                                            depth=2, start_filters=4,
                                            dropout=0.2, dtype="bfloat16"))
        opt = get_optimizer("adam", {"lr": 1e-3})
        state = create_train_state(model_f32, opt, (1, HW, HW, CH),
                                   jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        pad = (-VOL) % BATCH
        volume = rng.rand(VOL + pad, HW, HW, CH).astype(np.float32)
        batched = volume.reshape(-1, BATCH, HW, HW, CH)
        target = (rng.rand(VOL, HW, HW) > 0.5).astype(np.uint8)
        mask = rng.rand(VOL, HW, HW) > 0.2
        key = jax.random.PRNGKey(3)

        eces = {}
        for name, model in (("f32", model_f32), ("bf16", model_bf16)):
            fused = pipeline.make_volume_mc_eval_fn(model, MC_T, BATCH, VOL)
            out = fused(state.params, state.batch_stats, batched, target,
                        mask, THRESHOLDS, key)
            eces[name] = float(out["ece"])
        assert abs(eces["f32"] - eces["bf16"]) < 1e-3, eces

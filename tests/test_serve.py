"""Serving surface: persistent inference service + HTTP round trip."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.serve import VolumeInferenceService, make_http_server
from tests.test_strategies import base_train_cfg, make_store

pytestmark = pytest.mark.slow

HW = (16, 16)


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    store = make_store(str(tmp_path / "ds.h5"), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    loop = strategies.train_default(base_train_cfg(
        tmp_path, store, split_file, name="srv",
        model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                        "nb_classes": 2, "start_filters": 4}}))
    return VolumeInferenceService(loop.model_files.model_dir, mc=3,
                                  batch_size=2)


class TestService:
    def test_predict_without_target(self, service):
        volume = np.random.RandomState(0).rand(3, *HW, 4).astype(np.float32)
        out = service.predict(volume)
        assert out["prediction"].shape == (3, *HW)
        assert out["probabilities"].shape == (3, *HW)
        assert out["entropy"].shape == (3, *HW)
        assert out["prediction"].dtype == np.uint8
        np.testing.assert_array_equal(out["prediction"],
                                      out["probabilities"] > 0.5)
        assert float(out["entropy"].max()) <= 1.0 + 1e-5  # normalized
        assert "ece" not in out

    def test_predict_single_image(self, service):
        image = np.random.RandomState(1).rand(*HW, 4).astype(np.float32)
        out = service.predict(image)
        assert out["prediction"].shape == (1, *HW)

    def test_predict_scored(self, service):
        rng = np.random.RandomState(2)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        out = service.predict(volume, target=target)
        assert np.isfinite(float(out["ece"]))
        assert out["correction_corrected_dice"].shape == (11,)
        assert out["correction_tp"].shape == (11,)

    def test_target_shape_mismatch(self, service):
        volume = np.zeros((2, *HW, 4), np.float32)
        with pytest.raises(ValueError, match="does not match"):
            service.predict(volume, target=np.zeros((2, 4, 4)))

    def test_wrong_channel_count_rejected(self, service):
        """A wrong-C request must fail as a client error BEFORE the jitted
        forward turns it into an opaque shape error (an HTTP 500)."""
        with pytest.raises(ValueError, match="channels"):
            service.predict(np.zeros((2, *HW, 3), np.float32))

    def test_programs_are_shape_cached(self, service):
        volume = np.zeros((3, *HW, 4), np.float32)
        service.predict(volume)
        n = len(service.compiled_shapes())
        service.predict(volume)  # same shape -> no new program
        assert len(service.compiled_shapes()) == n
        # unscored programs key on the PADDED slice count: 3 and 4 slices at
        # batch 2 both pad to 4 and share one compiled program
        service.predict(np.zeros((4, *HW, 4), np.float32))
        assert len(service.compiled_shapes()) == n

    def test_small_volume_shrinks_the_batch(self, service):
        """A 1-slice (native-2D) request must run at batch 1, not padded out
        to the configured slice batch full of zero slices."""
        out = service.predict(np.zeros((1, *HW, 4), np.float32))
        assert out["prediction"].shape == (1, *HW)
        assert any(s.startswith("1-slices-b1") for s
                   in service.compiled_shapes())

    def test_mask_without_target_rejected(self, service):
        volume = np.zeros((2, *HW, 4), np.float32)
        with pytest.raises(ValueError, match="mask without a target"):
            service.predict(volume, mask=np.ones((2, *HW), np.uint8))

    def test_deterministic_service_mc0(self, service):
        """mc=0 serves the deterministic baseline protocol: the same
        request twice is bit-identical (no dropout sampling) and matches
        the plain forward."""
        import jax
        from rcu_tpu.eval.direct import _load_model_state
        det = VolumeInferenceService(service.model_dir, mc=0, batch_size=2)
        volume = np.random.RandomState(11).rand(2, *HW, 4).astype(np.float32)
        a = det.predict(volume)
        b = det.predict(volume)
        np.testing.assert_array_equal(a["probabilities"], b["probabilities"])
        model, params, batch_stats = _load_model_state(
            service.model_dir, "best", (1, *HW, 4))
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          volume, train=False)
        fg = np.asarray(jax.nn.softmax(out.logits, axis=-1))[..., 1]
        np.testing.assert_allclose(a["probabilities"], fg, rtol=1e-5,
                                   atol=1e-6)

    def test_fast_decoder_service_matches(self, service):
        """fast_decoder serves the same checkpoint through the concat-free
        + fused-upsample decoder; deterministic (mc=0) probabilities must
        match the plain service to accumulation precision."""
        plain = VolumeInferenceService(service.model_dir, mc=0, batch_size=2)
        fast = VolumeInferenceService(service.model_dir, mc=0, batch_size=2,
                                      fast_decoder=True)
        volume = np.random.RandomState(13).rand(2, *HW, 4).astype(np.float32)
        a = plain.predict(volume)
        b = fast.predict(volume)
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   rtol=1e-5, atol=1e-6)

    def test_fold_bn_service_matches_and_rejects_mc(self, service):
        """fold_bn serves the same checkpoint with the BatchNorms folded
        into the convs at load (deterministic only): f32 probabilities
        match the plain service to fold-algebra precision, and an MC
        (mc>0) service is rejected loudly."""
        plain = VolumeInferenceService(service.model_dir, mc=0, batch_size=2)
        fold = VolumeInferenceService(service.model_dir, mc=0, batch_size=2,
                                      fold_bn=True)
        volume = np.random.RandomState(13).rand(2, *HW, 4).astype(np.float32)
        a = plain.predict(volume)
        b = fold.predict(volume)
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   rtol=1e-4, atol=1e-5)
        with pytest.raises(ValueError, match="fold_bn covers"):
            VolumeInferenceService(service.model_dir, mc=3, batch_size=2,
                                   fold_bn=True)

    def test_quantized_service_matches(self, service):
        """quantize=True calibrates on the FIRST request's center slices,
        swaps the int8 trunk in before any program is built, and serves
        every later request from the baked scales; deterministic (mc=0)
        probabilities must track the plain service within the int8
        envelope and repeat bit-identically."""
        plain = VolumeInferenceService(service.model_dir, mc=0, batch_size=2)
        quant = VolumeInferenceService(service.model_dir, mc=0, batch_size=2,
                                       quantize=True)
        assert quant.compiled_shapes() == []  # nothing built pre-calibration
        volume = np.random.RandomState(14).rand(2, *HW, 4).astype(np.float32)
        a = plain.predict(volume)
        b = quant.predict(volume)
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   atol=5e-3)
        c = quant.predict(volume)  # reuses the baked scales + program
        np.testing.assert_array_equal(b["probabilities"], c["probabilities"])

    def test_quantized_ensemble_service_matches(self, service):
        """Ensemble quantize: union calibration over the stacked members on
        the first request (serve._ensure_quant_calibrated)."""
        plain = VolumeInferenceService(service.model_dir, mc=0, batch_size=2,
                                       members=[service.model_dir])
        quant = VolumeInferenceService(service.model_dir, mc=0, batch_size=2,
                                       members=[service.model_dir],
                                       quantize=True)
        assert plain.strategy == quant.strategy == "ensemble"
        volume = np.random.RandomState(15).rand(2, *HW, 4).astype(np.float32)
        a = plain.predict(volume)
        b = quant.predict(volume)
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   atol=5e-3)

    def test_per_image_scoring_matches_per_request(self, service):
        """per_image=True scores K independent images in ONE dispatch; each
        row must equal a separate single-image scored request exactly
        (deterministic mc=0 service)."""
        det = VolumeInferenceService(service.model_dir, mc=0, batch_size=2)
        rng = np.random.RandomState(13)
        images = rng.rand(3, *HW, 4).astype(np.float32)
        targets = (rng.rand(3, *HW) > 0.5).astype(np.uint8)
        out = det.predict(images, target=targets, per_image=True)
        assert out["ece"].shape == (3,)
        assert out["correction_corrected_dice"].shape == (3, 11)
        assert "probabilities" not in out  # scores-only contract
        for i in range(3):
            single = det.predict(images[i][None], target=targets[i][None])
            np.testing.assert_allclose(out["ece"][i], float(single["ece"]),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(
                out["correction_corrected_dice"][i],
                single["correction_corrected_dice"], rtol=1e-5, atol=1e-7)

    def test_per_image_requires_target(self, service):
        with pytest.raises(ValueError, match="scored-only"):
            service.predict(np.zeros((2, *HW, 4), np.float32),
                            per_image=True)

    def test_throughput_mode_matches_and_parallelizes(self, service):
        """subject_parallel: per-device state replicas, concurrent requests
        on different chips; deterministic (mc=0) results equal the
        single-device service exactly."""
        import concurrent.futures
        from rcu_tpu.parallel import mesh as mesh_lib
        pooled = VolumeInferenceService(
            service.model_dir, mc=0, batch_size=2,
            mesh=mesh_lib.make_mesh(n_devices=2), subject_parallel=True)
        single = VolumeInferenceService(service.model_dir, mc=0,
                                        batch_size=2)
        rng = np.random.RandomState(12)
        volumes = [rng.rand(2, *HW, 4).astype(np.float32) for _ in range(6)]

        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(pooled.predict, volumes))
        for volume, out in zip(volumes, outs):
            expect = single.predict(volume)
            np.testing.assert_allclose(out["probabilities"],
                                       expect["probabilities"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(out["prediction"],
                                          expect["prediction"])

    def test_mesh_service_matches_single_device(self, service):
        """Sharding each request over a mesh must not change the artifacts.
        Two FRESH services (same seed, same batch size -> same per-request
        RNG schedule), one sharded, one not, must agree bitwise-ish."""
        from rcu_tpu.parallel import mesh as mesh_lib
        sharded = VolumeInferenceService(
            service.model_dir, mc=3, batch_size=2,
            mesh=mesh_lib.make_mesh(n_devices=2), seed=0)
        single = VolumeInferenceService(service.model_dir, mc=3,
                                        batch_size=2, seed=0)
        volume = np.random.RandomState(4).rand(2, *HW, 4).astype(np.float32)
        a = single.predict(volume)
        b = sharded.predict(volume)
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(a["prediction"], b["prediction"])


class TestHttp:
    @pytest.fixture(scope="class")
    def server(self, service):
        httpd = make_http_server(service, "127.0.0.1", 0)  # ephemeral port
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    def _post(self, url, **arrays):
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        req = urllib.request.Request(url + "/v1/predict", data=buf.getvalue(),
                                     method="POST")
        return urllib.request.urlopen(req)

    def test_health(self, server):
        with urllib.request.urlopen(server + "/v1/health") as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok" and body["mc"] == 3
        assert body["strategy"] == "mc" and body["members"] == 0

    def test_predict_round_trip(self, server):
        rng = np.random.RandomState(3)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        with self._post(server, images=volume, target=target) as resp:
            out = np.load(io.BytesIO(resp.read()))
        assert out["prediction"].shape == (2, *HW)
        assert np.isfinite(float(out["ece"]))

    def test_concurrent_requests(self, server):
        """Device work serializes under the lock; handler threads must not
        trip over each other (health probes during predicts included)."""
        import concurrent.futures
        rng = np.random.RandomState(6)
        volume = rng.rand(2, *HW, 4).astype(np.float32)

        def predict(_):
            with self._post(server, images=volume) as resp:
                return resp.status

        def health(_):
            with urllib.request.urlopen(server + "/v1/health") as resp:
                return resp.status

        with concurrent.futures.ThreadPoolExecutor(6) as pool:
            codes = list(pool.map(predict, range(4))) \
                + list(pool.map(health, range(4)))
        assert codes == [200] * 8

    def test_corrupt_body_is_400(self, server):
        """A truncated npz (BadZipFile) is the client's fault, not a 500."""
        req = urllib.request.Request(server + "/v1/predict",
                                     data=b"PK\x03\x04 not a real zip",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400

    def test_bad_request_is_json_400(self, server):
        buf = io.BytesIO()
        np.savez_compressed(buf, wrong=np.zeros(3))
        req = urllib.request.Request(server + "/v1/predict",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
        assert "images" in json.loads(err.value.read())["error"]


@pytest.fixture(scope="module")
def aleatoric_service(service, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve_alea")
    store = make_store(str(tmp_path / "ds.h5"), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    loop = strategies.train_aleatoric(base_train_cfg(
        tmp_path, store, split_file, name="srv_alea",
        others={"is_log_sigma": False},
        model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                        "nb_classes": 2, "start_filters": 4,
                        "sigma_out": True}}))
    return VolumeInferenceService(loop.model_files.model_dir,
                                  batch_size=2, is_log_sigma=False)


class TestAleatoricService:
    def test_strategy_detected(self, aleatoric_service):
        assert aleatoric_service.strategy == "aleatoric"

    def test_missing_is_log_sigma_raises(self, aleatoric_service):
        with pytest.raises(ValueError, match="is_log_sigma"):
            VolumeInferenceService(aleatoric_service.model_dir, batch_size=2)

    def test_quantize_rejected(self, aleatoric_service):
        """Same scope rule as evaluate_direct: the int8 trunk never serves
        sigma/confidence heads (bf16 already misses their 1e-3 bar)."""
        with pytest.raises(ValueError, match="quantize"):
            VolumeInferenceService(aleatoric_service.model_dir, batch_size=2,
                                   is_log_sigma=False, quantize=True)

    def test_unscored_serves_raw_sigma(self, aleatoric_service):
        volume = np.random.RandomState(0).rand(2, *HW, 4).astype(np.float32)
        out = aleatoric_service.predict(volume)
        assert set(out) == {"prediction", "probabilities", "sigma"}
        assert out["sigma"].shape == (2, *HW)
        assert np.all(out["sigma"] >= 0)  # abs() semantics (non-log head)
        np.testing.assert_array_equal(out["prediction"],
                                      out["probabilities"] > 0.5)

    def test_bounds_add_folded_confidence(self, aleatoric_service):
        volume = np.random.RandomState(1).rand(2, *HW, 4).astype(np.float32)
        base = aleatoric_service.predict(volume)
        smin = float(base["sigma"].min()) - 0.1
        smax = float(base["sigma"].max()) + 0.1
        out = aleatoric_service.predict(volume, sigma_bounds=(smin, smax))
        eps = 1e-5
        rescaled = (base["sigma"] - smin) / (smax - smin) * (1 - 2 * eps) + eps
        expect = np.where(base["prediction"] == 1, 1 - rescaled / 2,
                          rescaled / 2)
        np.testing.assert_allclose(out["confidence"], expect, rtol=1e-5)

    def test_scored_without_bounds_rejected(self, aleatoric_service):
        volume = np.zeros((2, *HW, 4), np.float32)
        with pytest.raises(ValueError, match="sigma bounds"):
            aleatoric_service.predict(volume,
                                      target=np.zeros((2, *HW), np.uint8))

    def test_scored_matches_fold_oracle(self, aleatoric_service):
        from tests.test_ops_calibration import oracle_ece
        rng = np.random.RandomState(2)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        base = aleatoric_service.predict(volume)
        smin = float(base["sigma"].min()) - 0.1
        smax = float(base["sigma"].max()) + 0.1
        out = aleatoric_service.predict(volume, target=target,
                                        sigma_bounds=(smin, smax))
        assert out["correction_corrected_dice"].shape == (11,)
        probs2 = np.stack([1 - out["confidence"], out["confidence"]],
                          -1).astype(np.float64)
        expect = oracle_ece(probs2, target.astype(np.float64))
        np.testing.assert_allclose(float(out["ece"]), expect, rtol=1e-4,
                                   atol=1e-6)


@pytest.fixture(scope="module")
def ensemble_service(service, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve_ens")
    store = make_store(str(tmp_path / "ds.h5"), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    member = strategies.train_default(base_train_cfg(
        tmp_path, store, split_file, name="srv_m2",
        model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                        "nb_classes": 2, "start_filters": 4}}))
    return VolumeInferenceService(
        service.model_dir, batch_size=2,
        members=[member.model_files.model_dir])


class TestEnsembleService:
    def test_strategy_detected(self, ensemble_service):
        assert ensemble_service.strategy == "ensemble"
        assert len(ensemble_service.members) == 1

    def test_unscored_is_member_mean(self, ensemble_service, service):
        """The served probabilities are the member-mean softmax foreground
        (reference MultiPredictionSummary over the member loop)."""
        import jax
        from rcu_tpu.eval.direct import _load_model_state
        volume = np.random.RandomState(5).rand(2, *HW, 4).astype(np.float32)
        out = ensemble_service.predict(volume)
        member_fg = []
        for model_dir in ([ensemble_service.model_dir]
                          + ensemble_service.members):
            model, params, batch_stats = _load_model_state(
                model_dir, "best", (1, *HW, 4))
            mout = model.apply({"params": params,
                                "batch_stats": batch_stats},
                               volume, train=False)
            member_fg.append(np.asarray(
                jax.nn.softmax(mout.logits, axis=-1))[..., 1])
        expect = np.mean(member_fg, axis=0)
        np.testing.assert_allclose(out["probabilities"], expect, rtol=1e-5,
                                   atol=1e-6)
        assert float(out["entropy"].max()) <= 1.0 + 1e-5

    def test_scored(self, ensemble_service):
        rng = np.random.RandomState(6)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        out = ensemble_service.predict(volume, target=target)
        assert np.isfinite(float(out["ece"]))
        assert out["correction_tp"].shape == (11,)

    def test_sigma_bounds_rejected(self, ensemble_service):
        with pytest.raises(ValueError, match="aleatoric"):
            ensemble_service.predict(np.zeros((2, *HW, 4), np.float32),
                                     sigma_bounds=(0.0, 1.0))


class TestAuxiliaryServices:
    @pytest.fixture(scope="class")
    def feat_service(self, service, tmp_path_factory):
        tmp_path = tmp_path_factory.mktemp("serve_feat")
        store = make_store(str(tmp_path / "ds.h5"), channels=4)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        post = strategies.train_auxiliary_feat(base_train_cfg(
            tmp_path, store, split_file, name="srv_feat",
            model={"postnet": {"in_channels": 4, "nb_classes": 2}},
            others={"model_dir": service.model_dir, "test_at": "best"}))
        return VolumeInferenceService(post.model_files.model_dir,
                                      batch_size=2,
                                      segm_model_dir=service.model_dir)

    def test_feat_unscored(self, feat_service, service):
        """Artifacts = PostNet confidence + the FROZEN segmenter's argmax."""
        import jax
        from rcu_tpu.eval.direct import _load_model_state
        assert feat_service.strategy == "auxiliary_feat"
        volume = np.random.RandomState(8).rand(2, *HW, 4).astype(np.float32)
        out = feat_service.predict(volume)
        assert set(out) == {"prediction", "confidence"}
        assert 0.0 <= out["confidence"].min() \
            and out["confidence"].max() <= 1.0
        model, params, batch_stats = _load_model_state(
            service.model_dir, "best", (1, *HW, 4))
        segm = model.apply({"params": params, "batch_stats": batch_stats},
                           volume, train=False)
        np.testing.assert_array_equal(
            out["prediction"],
            np.argmax(np.asarray(segm.logits), axis=-1).astype(np.uint8))

    def test_feat_scored_matches_fold_oracle(self, feat_service):
        """Scoring = the confidence protocol: subject min-max rescale, fold
        by the prediction, masked ECE."""
        from tests.test_ops_calibration import oracle_ece
        rng = np.random.RandomState(9)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        out = feat_service.predict(volume, target=target)
        conf = out["confidence"].astype(np.float64)
        eps = 1e-5
        rescaled = (conf - conf.min()) / (conf.max() - conf.min()) \
            * (1 - 2 * eps) + eps
        folded = np.where(out["prediction"] == 1, 1 - rescaled / 2,
                          rescaled / 2)
        probs2 = np.stack([1 - folded, folded], -1)
        expect = oracle_ece(probs2, target.astype(np.float64))
        np.testing.assert_allclose(float(out["ece"]), expect, rtol=1e-4,
                                   atol=1e-6)
        assert out["correction_tp"].shape == (11,)

    @pytest.fixture(scope="class")
    def segm_service(self, tmp_path_factory):
        tmp_path = tmp_path_factory.mktemp("serve_segm")
        store = make_store(str(tmp_path / "ds.h5"), channels=4,
                           label_channels=2)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        train = strategies.train_auxiliary_segm(base_train_cfg(
            tmp_path, store, split_file, name="srv_segm",
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 5,
                            "nb_classes": 2, "start_filters": 4}}))
        return VolumeInferenceService(train.model_files.model_dir,
                                      batch_size=2, aux_segm=True)

    def test_segm_round_trip(self, segm_service):
        assert segm_service.strategy == "auxiliary_segm"
        rng = np.random.RandomState(10)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        baseline = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        out = segm_service.predict(volume, baseline=baseline)
        # the prediction artifact is the baseline PASSTHROUGH
        np.testing.assert_array_equal(out["prediction"], baseline)
        assert out["confidence"].shape == (2, *HW)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        scored = segm_service.predict(volume, baseline=baseline,
                                      target=target)
        assert np.isfinite(float(scored["ece"]))

    def test_segm_requires_baseline(self, segm_service):
        with pytest.raises(ValueError, match="baseline"):
            segm_service.predict(np.zeros((2, *HW, 4), np.float32))

    def test_baseline_rejected_elsewhere(self, service):
        with pytest.raises(ValueError, match="auxiliary-segm"):
            service.predict(np.zeros((2, *HW, 4), np.float32),
                            baseline=np.zeros((2, *HW), np.uint8))


class TestProgramCacheLru:
    def test_scored_programs_evict_at_cap(self, service):
        """ADVICE r2: scored programs key on the exact slice count, so the
        cache must be a bounded LRU, not grow one compiled program per
        distinct volume Z for the lifetime of the server."""
        small = VolumeInferenceService(service.model_dir, mc=2, batch_size=2,
                                       max_programs=2)
        rng = np.random.RandomState(7)
        for nz in (2, 3, 4):
            volume = rng.rand(nz, *HW, 4).astype(np.float32)
            target = (rng.rand(nz, *HW) > 0.5).astype(np.uint8)
            out = small.predict(volume, target=target)
            assert np.isfinite(float(out["ece"]))
            assert len(small.compiled_shapes()) <= 2
        # evicted shape still answers (recompile, not crash)
        volume = rng.rand(2, *HW, 4).astype(np.float32)
        target = (rng.rand(2, *HW) > 0.5).astype(np.uint8)
        assert np.isfinite(float(small.predict(volume,
                                               target=target)["ece"]))

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

"""Unit tests for smaller subsystems: profiling, eval CSV bins expansion,
checkpoint postfix addressing, writer pool error propagation."""
import csv
import os
import time

import numpy as np
import pytest

from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.eval import hooks as ev_hooks
from rcu_tpu.utils.profiling import Timer
from rcu_tpu.utils.writerpool import WriterPool


class TestTimer:
    def test_sections_accumulate(self):
        t = Timer()
        with t.section("a"):
            time.sleep(0.01)
        with t.section("a"):
            time.sleep(0.01)
        with t.section("b"):
            pass
        assert t.sections["a"] >= 0.02
        assert "a=" in t.report() and "b=" in t.report()


class TestWriterPool:
    def test_flush_propagates_errors(self):
        pool = WriterPool()

        def boom():
            raise RuntimeError("disk full")

        pool.submit(boom)
        with pytest.raises(RuntimeError, match="disk full"):
            pool.flush()

    def test_flush_waits_for_writes(self, tmp_path):
        pool = WriterPool()
        path = tmp_path / "x.txt"

        def slow_write():
            time.sleep(0.05)
            path.write_text("done")

        pool.submit(slow_write)
        pool.flush()
        assert path.read_text() == "done"

    def test_flush_waits_out_all_writes_even_when_one_fails(self, tmp_path):
        """An early failure must not abandon still-running writes untracked:
        flush waits for EVERYTHING, then re-raises — the caller tears down
        only after the run dir has stopped changing."""
        pool = WriterPool(max_workers=2)
        path = tmp_path / "late.txt"

        def boom():
            raise RuntimeError("disk full")

        def slow_write():
            time.sleep(0.2)
            path.write_text("done")

        pool.submit(boom)
        pool.submit(slow_write)
        with pytest.raises(RuntimeError, match="disk full"):
            pool.flush()
        assert path.read_text() == "done"  # completed BEFORE flush returned
        pool.shutdown()

    def test_shutdown_stops_executor_even_when_flush_raises(self):
        pool = WriterPool()
        pool.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
        with pytest.raises(RuntimeError, match="boom"):
            pool.shutdown()
        assert pool._executor._shutdown


class TestBinsCsvExpansion:
    def test_compressed_bins_expand_to_fixed_columns(self, tmp_path):
        """Reference hook.py:75-93: masked/compressed bins arrays re-expand to
        the fixed 10 columns with zeros."""
        out = str(tmp_path / "bins.csv")
        hook = ev_hooks.WriteBinsCsvHook(out)
        nonzero = np.array([True, False, True] + [False] * 7)
        results = {
            "bins_count": np.array([5, 7]),              # compressed (2 bins)
            "bins_avg_confidence": np.array([0.1, 0.25]),
            "bins_positive_fraction": np.array([0.2, 0.3]),
            "bins_non_zero": nonzero,
            "ece": 0.05, "dice": 0.9,
        }
        hook.on_subject(results, "subj", "run1")
        hook.on_run_end({}, "run1")
        with open(out) as f:
            rows = list(csv.reader(f))
        header, row = rows[0], rows[1]
        assert header.count("bins_count_00") == 1 and "bins_count_09" in header
        count_cols = [row[header.index(f"bins_count_{i:02d}")] for i in range(10)]
        assert [int(c) for c in count_cols] == [5, 0, 7, 0, 0, 0, 0, 0, 0, 0]
        conf2 = row[header.index("bins_avg_confidence_02")]
        assert float(conf2) == 0.25


class TestCheckpointPostfix:
    def test_postfix_addressing(self, tmp_path):
        mf = ckpt_lib.ModelFiles(str(tmp_path / "model_x"))
        state = {"params": {"w": np.ones(3)}}
        ckpt_lib.save_checkpoint(mf, state, 1, postfix="aux")
        ckpt_lib.save_checkpoint(mf, state, 3, postfix="aux")
        ckpt_lib.save_checkpoint(mf, state, 2, best=True, postfix="aux")
        ckpt_lib.save_checkpoint(mf, state, 7)  # un-postfixed must not mix
        assert ckpt_lib.find_last_checkpoint_epoch(mf, postfix="aux") == 3
        assert ckpt_lib.find_best_checkpoint_epoch(mf, postfix="aux") == 2
        assert ckpt_lib.find_last_checkpoint_epoch(mf) == 7
        path = ckpt_lib.find_checkpoint_file(mf, "best", postfix="aux")
        assert path.endswith("checkpoint-aux_ep002-best.ckpt")
        restored = ckpt_lib.load_checkpoint(path)
        np.testing.assert_array_equal(restored["params"]["w"], np.ones(3))
        ckpt_lib.delete_checkpoint(mf, 1, postfix="aux")
        assert ckpt_lib.find_checkpoint_file(mf, 1, postfix="aux") is None


class TestRunLogIsolation:
    def test_new_run_log_detaches_previous_runs_file(self, tmp_path):
        """One process running several loops: each run's log.txt must hold
        only its own records — later runs must not keep appending into
        earlier run dirs."""
        import logging
        from rcu_tpu.utils import logs as logs_lib

        root = logging.getLogger()
        saved = list(root.handlers)
        try:
            d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
            logs_lib.setup_logging(d1)
            logging.info("first-run-record")
            logs_lib.setup_logging(d2)
            logging.info("second-run-record")
            t1 = open(os.path.join(d1, "log.txt")).read()
            t2 = open(os.path.join(d2, "log.txt")).read()
            assert "first-run-record" in t1
            assert "second-run-record" not in t1  # old handler detached
            assert "second-run-record" in t2
        finally:
            for h in list(root.handlers):
                if h not in saved:
                    root.removeHandler(h)
                    h.close()


class TestPipelinedRates:
    """bench._pipelined_rates — the async-window timing used by the
    per-protocol matrix legs (queue G dispatches, sync once): the rate math
    and call accounting must hold or every matrix number is wrong."""

    def _bench(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        return bench

    def test_call_count_and_rate_units(self):
        import jax.numpy as jnp
        bench = self._bench()
        calls = []

        def dispatch():
            calls.append(1)
            return jnp.float32(0.0)

        best, mean = bench._pipelined_rates(dispatch, n_chunks=4,
                                            vox_per_call=1_000)
        # 1 compile+warm + 1+4 sizing-window calls + g per timed chunk
        g = (len(calls) - 6) / 4
        assert g == int(g) and g >= 1
        assert best >= mean > 0

    def test_slow_dispatch_gets_small_window(self):
        import jax.numpy as jnp
        bench = self._bench()
        calls = []

        def dispatch():
            calls.append(1)
            time.sleep(0.4)  # marginal time over the 1.2s target at g=4
            return jnp.float32(0.0)

        bench._pipelined_rates(dispatch, n_chunks=1, vox_per_call=10)
        g = len(calls) - 6
        assert 1 <= g <= 4

    def test_matrix_train_legs_cover_both_decoders(self, monkeypatch):
        """bench_matrix_extras must emit BOTH the production (fast-decoder)
        train rows and the _plain reference-shaped rows, with the
        train_decoder annotation — the r5 review found fastdec rates shipped
        under plain-looking keys."""
        bench = self._bench()
        seen = []

        class _FakeTrain:
            B, H, W = 32, 240, 240

            @staticmethod
            def bench(dtype=None, fast_decoder=False):
                seen.append((dtype, fast_decoder))
                return (10.0 if fast_decoder else 9.5), 0, 0, 0, 0

        def fake_load(name):
            if name == "bench_train":
                return _FakeTrain
            raise RuntimeError(f"leg {name} stubbed out")

        monkeypatch.setattr(bench, "_load_script", fake_load)
        out = bench.bench_matrix_extras()
        assert out["train_decoder"] == "fast"
        for key, rate in [("train_f32_steps_per_sec", 10.0),
                          ("train_f32_plain_steps_per_sec", 9.5),
                          ("train_bf16_steps_per_sec", 10.0),
                          ("train_bf16_plain_steps_per_sec", 9.5)]:
            assert out[key] == rate, (key, out)
            vox_key = key.replace("steps_per_sec", "voxels_per_sec")
            assert out[vox_key] == round(rate * 32 * 240 * 240, 1)
        assert set(seen) == {(None, True), (None, False),
                             ("bfloat16", True), ("bfloat16", False)}

    def test_window_sizing_ignores_sync_rtt(self):
        """The window must be sized from the MARGINAL per-call device time,
        not a synced call's wall time: with a 0.3s fetch RTT over a 0.05s
        device program, sizing from one synced call would pick g=3 (0.15s of
        device work per window — the r4 per-dispatch-sync contamination);
        the marginal estimate must fill the window with ~1s of device work."""
        bench = self._bench()
        t_item, rtt = 0.05, 0.30
        calls = []
        state = {"free_at": 0.0}

        class _Async:
            def __init__(self, ready_at):
                self.ready_at = ready_at

            def __float__(self):
                time.sleep(max(0.0, self.ready_at - time.perf_counter())
                           + rtt)
                return 0.0

        def dispatch():
            calls.append(1)  # async: returns immediately, device works on
            state["free_at"] = max(state["free_at"],
                                   time.perf_counter()) + t_item
            return _Async(state["free_at"])

        bench._pipelined_rates(dispatch, n_chunks=1, vox_per_call=10)
        g = len(calls) - 6
        assert g >= 12, f"window holds only {g * t_item:.2f}s of device work"

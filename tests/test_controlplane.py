"""Reconcile semantics vs a fake runtime — mirrors the behavior table
of reference main.sh:146-196 (upsert-new, upsert-changed, no-op on
same config, prune-unmanaged, delete-retry)."""

from __future__ import annotations

import pytest

from heroku_kafka_connect_spark.controlplane import (
    PipelineSpec,
    QueryRuntime,
    Reconciler,
    SpecError,
    specs_from_env,
    validate_env,
)


class FakeRuntime(QueryRuntime):
    def __init__(self, *, fail_stops: int = 0, ready_after: int = 0):
        self.running: dict[str, str] = {}
        self.events: list[tuple[str, str]] = []
        self._fail_stops = fail_stops
        self._ready_after = ready_after

    def list_running(self):
        return dict(self.running)

    def start(self, spec: PipelineSpec):
        self.running[spec.name] = spec.fingerprint()
        self.events.append(("start", spec.name))

    def stop(self, name: str):
        if self._fail_stops > 0:
            self._fail_stops -= 1
            raise RuntimeError("409 rebalance in progress")
        self.running.pop(name, None)
        self.events.append(("stop", name))

    def is_ready(self):
        if self._ready_after > 0:
            self._ready_after -= 1
            return False
        return True


def spec(name: str, **extra) -> PipelineSpec:
    cfg = {"source.format": "rate", "sink.format": "memory"}
    cfg.update(extra)
    return PipelineSpec(name=name, config=cfg)


def reconciler(rt, **kw) -> Reconciler:
    return Reconciler(rt, sleep=lambda _s: None, **kw)


def test_upsert_new_starts_pipeline():
    rt = FakeRuntime()
    rep = reconciler(rt).reconcile_once([spec("a"), spec("b")])
    assert rep.started == ["a", "b"] and rt.running.keys() == {"a", "b"}


def test_same_config_is_noop():
    rt = FakeRuntime()
    r = reconciler(rt)
    r.reconcile_once([spec("a")])
    rep = r.reconcile_once([spec("a")])
    assert rep.unchanged == ["a"] and rep.started == [] and rep.restarted == []


def test_changed_config_restarts():
    rt = FakeRuntime()
    r = reconciler(rt)
    r.reconcile_once([spec("a")])
    rep = r.reconcile_once([spec("a", extra="1")])
    assert rep.restarted == ["a"]
    assert ("stop", "a") in rt.events and rt.events[-1] == ("start", "a")


def test_prune_unmanaged():
    rt = FakeRuntime()
    r = reconciler(rt)
    r.reconcile_once([spec("a"), spec("zombie")])
    rep = r.reconcile_once([spec("a")])
    assert rep.pruned == ["zombie"] and "zombie" not in rt.running


def test_stop_retries_then_succeeds():
    rt = FakeRuntime(fail_stops=3)
    rep = reconciler(rt).reconcile_once([])  # nothing desired
    assert rep.failed == {}  # no running either — trivially fine
    rt.running["ghost"] = "x"
    rep = reconciler(rt).reconcile_once([])
    assert rep.pruned == ["ghost"]


def test_stop_retry_exhaustion_reports_failure():
    rt = FakeRuntime(fail_stops=99)
    rt.running["stuck"] = "x"
    rep = reconciler(rt, stop_retries=3).reconcile_once([])
    assert rep.failed == {"stuck": "prune failed"}


def test_per_pipeline_failure_is_isolated():
    class Boom(FakeRuntime):
        def start(self, s):
            if s.name == "bad":
                raise RuntimeError("no such source")
            super().start(s)

    rt = Boom()
    rep = reconciler(rt).reconcile_once([spec("bad"), spec("good")])
    assert "bad" in rep.failed and rep.started == ["good"]


def test_wait_ready_polls():
    rt = FakeRuntime(ready_after=5)
    assert reconciler(rt).wait_ready() is True
    rt2 = FakeRuntime(ready_after=99)
    assert reconciler(rt2, ready_tries=3).wait_ready() is False


def test_specs_from_env_roundtrip():
    env = {
        "CONNECTOR_NAMES": "orders events",
        "CONNECTOR_ORDERS": '{"source.format": "kafka", "sink.format": "parquet"}',
        "CONNECTOR_EVENTS": '{"source.format": "rate", "sink.format": "memory"}',
    }
    specs = specs_from_env(env)
    assert [s.name for s in specs] == ["orders", "events"]
    assert specs[0].config["source.format"] == "kafka"


def test_specs_from_env_missing_config():
    with pytest.raises(SpecError, match="ORDERS is unset"):
        specs_from_env({"CONNECTOR_NAMES": "orders"})


def test_specs_from_env_bad_json():
    env = {"CONNECTOR_NAMES": "a", "CONNECTOR_A": "{nope"}
    with pytest.raises(SpecError, match="not valid JSON"):
        specs_from_env(env)


def test_spec_validation_requires_source_and_sink():
    with pytest.raises(SpecError, match="missing required config"):
        PipelineSpec("x", {"source.format": "rate"}).validate()


def test_validate_env_fail_fast():
    with pytest.raises(SpecError, match="missing required environment"):
        validate_env({"KAFKA_URL": "ssl://h:9096"})
    validate_env(
        {
            "KAFKA_URL": "ssl://h:9096",
            "KAFKA_CLIENT_CERT": "pem",
            "KAFKA_CLIENT_CERT_KEY": "pem",
            "KAFKA_TRUSTED_CERT": "pem",
        }
    )


# ---------------------------------------------------------------- E10 REST


def test_status_server_surface():
    """E10: the read-only Connect REST analog (GET /connectors,
    GET /connectors/<name>, readiness at /) over a runtime."""
    import json as _json
    import urllib.error
    import urllib.request

    from heroku_kafka_connect_spark.rest import StatusServer

    rt = FakeRuntime()
    rt.start(PipelineSpec(name="p1", config={"source.format": "parquet", "sink.format": "memory"}))
    srv = StatusServer(rt)
    port = srv.start()
    try:
        get = lambda p: _json.loads(  # noqa: E731
            urllib.request.urlopen(f"http://127.0.0.1:{port}{p}").read()
        )
        assert get("/") == {"ready": True}
        assert get("/connectors") == ["p1"]
        one = get("/connectors/p1")
        assert one["name"] == "p1" and one["state"] == "RUNNING" and one["fingerprint"]
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/connectors/ghost")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_rest_mutation_surface():
    """E10 write path (r5 verdict gap): the reference's main.sh drives
    Connect with PUT /connectors/<name>/config (main.sh:156-159) and
    DELETE /connectors/<name> with retry (main.sh:130-141,190-195).
    The full behavior table over HTTP: PUT new → 201 start; PUT same
    config → 200 no-op; PUT changed → 200 restart with NEW
    fingerprint; PUT invalid spec → 400; DELETE → 204 prune; DELETE
    absent → 404; DELETE under persistent 409 → 409."""
    import json as _json
    import urllib.error
    import urllib.request

    from heroku_kafka_connect_spark.rest import StatusServer

    rt = FakeRuntime()
    srv = StatusServer(rt, reconciler=reconciler(rt))
    port = srv.start()

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            method=method,
            data=None if body is None else _json.dumps(body).encode(),
        )
        resp = urllib.request.urlopen(req)
        raw = resp.read()
        return resp.status, (_json.loads(raw) if raw else None)

    try:
        cfg = {"source.format": "rate", "sink.format": "memory"}
        code, out = call("PUT", "/connectors/p1/config", cfg)
        assert code == 201 and out["outcome"] == "started"
        assert rt.events[-1] == ("start", "p1")
        fp1 = out["fingerprint"]

        # identical config: no-op (no restart event)
        n_events = len(rt.events)
        code, out = call("PUT", "/connectors/p1/config", cfg)
        assert code == 200 and out["outcome"] == "unchanged"
        assert len(rt.events) == n_events

        # changed config: restart with a new fingerprint
        code, out = call("PUT", "/connectors/p1/config", {**cfg, "x": "1"})
        assert code == 200 and out["outcome"] == "restarted"
        assert out["fingerprint"] != fp1
        assert rt.events[-2:] == [("stop", "p1"), ("start", "p1")]
        assert rt.running["p1"] == out["fingerprint"]

        # invalid spec: 400, nothing started
        try:
            call("PUT", "/connectors/bad/config", {"source.format": "rate"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "bad" not in rt.running

        # non-object body: 400
        try:
            call("PUT", "/connectors/bad/config", ["not", "a", "map"])
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # DELETE: 204 and pruned
        code, out = call("DELETE", "/connectors/p1")
        assert code == 204 and out is None and "p1" not in rt.running

        # DELETE absent: 404
        try:
            call("DELETE", "/connectors/p1")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # DELETE under persistent rebalance conflict: 409 after retries
        rt2 = FakeRuntime(fail_stops=99)
        rt2.start(spec("stuck"))
        srv2 = StatusServer(rt2, reconciler=reconciler(rt2, stop_retries=2))
        port2 = srv2.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port2}/connectors/stuck", method="DELETE"
            )
            urllib.request.urlopen(req)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409 and "stuck" in rt2.running
        finally:
            srv2.shutdown()
    finally:
        srv.shutdown()


def test_rest_put_conflict_maps_to_409_and_lock_is_shared():
    """r6 review fixes: (a) a PUT whose stop-for-restart retries
    exhaust returns 409 (same as DELETE — Connect's rebalance
    conflict), leaving the old pipeline running; (b) the REST
    mutation lock IS the reconciler's lock, so the boot thread's
    reconcile pass and HTTP mutations serialize against each other,
    not just HTTP-vs-HTTP."""
    import json as _json
    import urllib.error
    import urllib.request

    from heroku_kafka_connect_spark.rest import StatusServer

    rt = FakeRuntime(fail_stops=99)
    rec = reconciler(rt, stop_retries=2)
    srv = StatusServer(rt, reconciler=rec)
    assert srv._mutate is rec.lock  # shared serialization point
    rt.start(spec("p1"))
    old_fp = rt.running["p1"]
    port = srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/connectors/p1/config",
            method="PUT",
            data=_json.dumps(
                {"source.format": "rate", "sink.format": "memory", "x": "new"}
            ).encode(),
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
        assert rt.running["p1"] == old_fp  # old pipeline untouched
    finally:
        srv.shutdown()


def test_http_mutation_retry_budget_is_bounded():
    """r6 advice (rest.py head-of-line blocking): HTTP PUT/DELETE hold
    the SHARED reconciler lock for the whole stop-retry ladder, so the
    boot path's 8×2s budget would block every other mutation ~16s per
    stuck pipeline. The HTTP path now runs a bounded ladder (default
    3×0.5s, never looser than the boot budget) on a reconciler that
    shares the boot lock and the boot (injectable) sleep."""
    import urllib.error
    import urllib.request

    sleeps: list[float] = []
    rt = FakeRuntime(fail_stops=99)
    rec = Reconciler(rt, sleep=sleeps.append)  # boot default: 8 × 2s
    from heroku_kafka_connect_spark.rest import StatusServer

    srv = StatusServer(rt, reconciler=rec)
    # shared serialization point + bounded budget + inherited fake clock
    assert srv._http_rec.lock is rec.lock
    assert srv._http_rec.stop_retries == 3
    assert srv._http_rec.retry_sleep_s == 0.5
    assert srv._http_rec._sleep is rec._sleep
    rt.start(spec("stuck"))
    port = srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/connectors/stuck", method="DELETE"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
        # 3 attempts → 2 inter-attempt sleeps of 0.5s, not the boot
        # ladder's 7×2s: worst-case lock hold ~1s, not ~14s
        assert sleeps == [0.5, 0.5]
        # a custom boot budget TIGHTER than the HTTP default wins
        srv2 = StatusServer(rt, reconciler=reconciler(rt, stop_retries=2))
        assert srv2._http_rec.stop_retries == 2
    finally:
        srv.shutdown()


def test_reconcile_and_upsert_serialize_on_one_lock():
    """Concurrency regression for the boot-vs-HTTP interleave: a slow
    reconcile pass holds the lock; a concurrent upsert of the same
    name must wait and then see the POST-reconcile state (no double
    start, no stale-fingerprint race)."""
    import threading
    import time as _time

    class SlowStopRuntime(FakeRuntime):
        def stop(self, name):
            _time.sleep(0.2)  # widen the stop→start window
            super().stop(name)

    rt = SlowStopRuntime()
    rec = reconciler(rt)
    rt.start(spec("a"))
    changed = spec("a", x="2")

    t = threading.Thread(target=lambda: rec.reconcile_once([changed]))
    t.start()
    _time.sleep(0.05)  # let reconcile enter its stop window
    outcome = rec.upsert(changed)  # same config as the reconcile pass
    t.join()
    # the HTTP-style upsert saw the post-reconcile state: identical
    # fingerprint -> no-op; exactly ONE start of the new config ran
    assert outcome == "unchanged"
    assert rt.events.count(("start", "a")) == 2  # initial + restart only
    assert rt.running["a"] == changed.fingerprint()

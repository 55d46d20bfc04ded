"""REST façade tests ≡ `api_test.go:79-118`: POST → 201 + retrievable
config; GET roundtrip equals submitted JSON; 404 and 400 paths."""

from __future__ import annotations

import http.client
import json
import time

import pytest

from go_fish_spark.plans.api import PipelineAPI
from go_fish_spark.plans.registry import PipelineRegistry

SPEC = json.dumps(
    {
        "sources": {"in": {"type": "memory", "options": {"rows": [("a",)], "schema": "value string"}}},
        "rules": {"r": {"source": "in", "task": "filter_eq", "sink": "out",
                          "options": {"column": "value", "value": "a"}}},
        "sinks": {"out": {"type": "memory"}},
        "states": {},
    }
)


@pytest.fixture()
def api(tmp_path):
    ran = []
    a = PipelineAPI(PipelineRegistry(str(tmp_path / "reg")), runner=ran.append)
    a.start()
    a.ran = ran
    yield a
    a.stop()


def _req(api, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", api.port, timeout=10)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read().decode()
    conn.close()
    return resp.status, data


def test_post_then_get_roundtrip(api):
    status, uid = _req(api, "POST", "/pipelines", SPEC)
    assert status == 201 and uid
    status, cfg = _req(api, "GET", f"/pipelines/{uid}")
    assert status == 200
    assert json.loads(cfg) == json.loads(SPEC)
    # runner invoked asynchronously with the raw config (`api.go:126-131`)
    deadline = time.time() + 5
    while time.time() < deadline and not api.ran:
        time.sleep(0.05)
    assert api.ran == [SPEC]


def test_get_missing_is_404(api):
    status, body = _req(api, "GET", "/pipelines/no-such-uuid")
    assert status == 404


def test_post_invalid_is_400(api):
    bad = json.dumps({"sources": {}, "rules": {"r": {"source": "ghost", "task": "t"}},
                      "sinks": {}, "states": {}})
    status, body = _req(api, "POST", "/pipelines", bad)
    assert status == 400
    assert "unknown source" in body
    assert api.ran == []


def test_prometheus_text_golden():
    """≡ monitoring_test.go:45-83: exact exposition body for one pipeline
    gauge sample under a custom namespace."""
    from go_fish_spark.streaming.monitoring import prometheus_text

    body = prometheus_text(
        pipelines={"pipeline": 1},
        events={},
        namespace="TestPrometheusMonitoring",
    )
    assert body == (
        "# HELP TestPrometheusMonitoringPipelines The number of pipelines configured\n"
        "# TYPE TestPrometheusMonitoringPipelines gauge\n"
        'TestPrometheusMonitoringPipelines{pipelineName="pipeline"} 1\n'
        "# HELP TestPrometheusMonitoringEventsReceived The number of events received\n"
        "# TYPE TestPrometheusMonitoringEventsReceived counter\n"
    )


def test_metrics_endpoint_scrape(tmp_path):
    """GET /metrics serves the text format off the registry + listener
    snapshot (≡ monitoring.go:86 route registration)."""
    from go_fish_spark.streaming.monitoring import MetricsListener

    listener = MetricsListener()
    listener.metrics.by_query = {"sess_q": 42}
    a = PipelineAPI(
        PipelineRegistry(str(tmp_path / "reg")), metrics=listener
    )
    a.start()
    try:
        _req(a, "POST", "/pipelines", SPEC)
        status, body = _req(a, "GET", "/metrics")
    finally:
        a.stop()
    assert status == 200
    assert "# TYPE go-fishPipelines gauge" in body
    assert body.count('go-fishPipelines{pipelineName="') == 1
    assert 'go-fishEventsReceived{pipelineName="sess_q"} 42' in body

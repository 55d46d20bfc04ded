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

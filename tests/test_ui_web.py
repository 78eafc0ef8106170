"""Web editor (ui/web.py) — the windowed JuicyPluginEditor analog:
painted meters + mouse sliders over HTTP, same numeric model as the
terminal panel."""

import json
import urllib.request

import pytest

from juicy_tpu.ui.meters import MeterPanel, FEATURE_BARS
from juicy_tpu.ui.web import MeterWebServer, panel_html, _xterm256_to_hex

SPECS = [("punch", 0.0, 1.0, 0.5), ("clip", 0.0, 1.0, 0.25)]


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_panel_html_structure():
    """The page carries one slider per NON-readonly param (the
    createControls skip-list, JuicyPluginEditor.cpp:104-113), the five
    feature bars in their reference colours, and no external assets."""
    html = panel_html("JuicyPunch", SPECS, show_ghost_stats=True)
    for pid, lo, hi, value in SPECS:
        assert f'data-pid="{pid}"' in html
        assert f'min="{lo}" max="{hi}"' in html
    for key, label in FEATURE_BARS:
        assert f'id="f_{key}"' in html and label in html
        assert _xterm256_to_hex(
            __import__("juicy_tpu.ui.meters", fromlist=["BAR_COLOURS"])
            .BAR_COLOURS[key]) in html
    assert "http://" not in html and "https://" not in html  # self-contained
    # accent hue is the title-hash editor accent (cpp:3-9)
    from juicy_tpu.ui.meters import accent_hue_from_title
    assert f"{round(accent_hue_from_title('JuicyPunch') * 360.0, 1)}" in html


def test_xterm256_to_hex_cube():
    assert _xterm256_to_hex(16) == "#000000"
    assert _xterm256_to_hex(231) == "#ffffff"
    assert _xterm256_to_hex(196) == "#ff0000"   # red corner of the cube


def test_meter_web_server_roundtrip():
    """GET / serves the page; /state mirrors the SAME MeterPanel numeric
    model (asym smoothing + ghost stats) the terminal renders; slider
    POSTs arrive range-clamped via pop_param_edits; /stop latches."""
    srv = MeterWebServer("JuicyPunch", SPECS, show_ghost_stats=True)
    try:
        status, body = _get(srv.url)
        assert status == 200 and b"JUICINESS INDEX" in body

        ref = MeterPanel("JuicyPunch", show_ghost_stats=True)
        for m in ({"pre_score": 60.0, "post_score": 80.0, "punch": 0.7},
                  {"pre_score": 40.0, "post_score": 90.0, "punch": 0.2},
                  {"pre_score": 55.0, "post_score": 70.0, "punch": 0.9}):
            srv.set_metrics(m)
            ref.set_metrics(m)
        status, body = _get(srv.url + "state")
        state = json.loads(body)
        assert state["pre_score"] == pytest.approx(ref.smoothed["pre_score"])
        assert state["post_score"] == pytest.approx(
            ref.smoothed["post_score"])
        bar = state["bars"]["punch"]
        st = ref.stats["punch"]
        assert bar["value"] == pytest.approx(ref.smoothed["punch"])
        assert (bar["min"], bar["max"], bar["count"]) == \
            (pytest.approx(st.min), pytest.approx(st.max), st.count)
        assert bar["avg"] == pytest.approx(st.avg)

        # slider edit: clamped into [lo, hi], drained exactly once
        status, _ = _post(srv.url + "param",
                          json.dumps({"id": "punch", "value": 7.5}).encode())
        assert status == 200
        assert srv.pop_param_edits() == {"punch": 1.0}
        assert srv.pop_param_edits() == {}

        # unknown param / garbage body rejected without queuing
        status, _ = _post(srv.url + "param",
                          json.dumps({"id": "nope", "value": 1}).encode())
        assert status == 400
        status, _ = _post(srv.url + "param", b"{not json")
        assert status == 400
        assert srv.pop_param_edits() == {}

        # params view follows the loop's values
        srv.set_params_view({"punch": 0.8, "clip": 0.1, "ignored": 9.0})
        srv.set_metrics({"pre_score": 50.0})
        state = json.loads(_get(srv.url + "state")[1])
        assert state["params"] == {"punch": 0.8, "clip": 0.1}

        # null/wrong-typed JSON must 400, not abort the connection
        # (float(None)/list-index raise TypeError inside the handler)
        status, _ = _post(srv.url + "param",
                          json.dumps({"id": "punch", "value": None}).encode())
        assert status == 400
        status, _ = _post(srv.url + "param", json.dumps(["x"]).encode())
        assert status == 400
        assert srv.pop_param_edits() == {}

        # non-finite metrics must serialize to valid JSON (browser's
        # response.json() would otherwise throw and stall the poll)
        srv.set_metrics({"pre_score": float("nan"),
                         "post_score": float("inf"), "punch": float("nan")})
        state = json.loads(_get(srv.url + "state")[1])   # strict JSON parse
        assert state["pre_score"] == 0.0

        # cross-origin POSTs are rejected (DNS-rebinding/CSRF guard):
        # wrong Host, and evil Origin with correct Host
        req = urllib.request.Request(srv.url + "stop", data=b"",
                                     method="POST")
        req.add_header("Host", "evil.example:80")
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 403 and not srv.stop_requested
        req = urllib.request.Request(srv.url + "stop", data=b"",
                                     method="POST")
        req.add_header("Origin", "http://evil.example")
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 403 and not srv.stop_requested

        # stop control latches for the render loop
        assert not srv.stop_requested
        assert _post(srv.url + "stop", b"")[0] == 200
        assert srv.stop_requested

        # title / param ids are HTML-escaped in the page
        page = panel_html("<script>x</script>", [("a<b", 0.0, 1.0, 0.5)])
        assert "<script>x</script>" not in page
        assert 'data-pid="a<b"' not in page
    finally:
        srv.close()

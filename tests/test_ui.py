"""Meter-panel model tests (JuicyMeterPanel numeric behavior)."""

from juicy_tpu.ui.meters import MeterPanel, MetricStats, accent_hue_from_title


def test_asymmetric_smoothing():
    panel = MeterPanel("T")
    panel.set_metrics({"score": 100.0, "pre_score": 100.0, "post_score": 100.0,
                       "punch": 1.0})
    up = panel.smoothed["punch"]
    assert abs(up - 0.28) < 1e-9           # rising α = 0.28 (cpp:5)
    panel.set_metrics({"score": 0.0, "pre_score": 100.0, "post_score": 100.0,
                       "punch": 0.0})
    down = panel.smoothed["punch"]
    assert abs(down - up * (1 - 0.12)) < 1e-9   # falling α = 0.12


def test_stats_min_max_incremental_avg():
    s = MetricStats()
    for v in (0.2, 0.8, 0.5):
        s.update(v)
    assert s.min == 0.2 and s.max == 0.8 and s.count == 3
    assert abs(s.avg - 0.5) < 1e-9


def test_stats_clamp():
    s = MetricStats()
    s.update(3.0)
    s.update(-1.0)
    assert s.max == 1.0 and s.min == 0.0


def test_render_modes():
    panel = MeterPanel("Juicy Infer", show_ghost_stats=True,
                       show_triangle_metrics=True)
    for _ in range(4):
        panel.set_metrics({"score": 61.0, "pre_score": 50.0, "post_score": 61.0,
                           "emphasis": 0.4, "coherence": 0.6,
                           "synesthesia": 0.3, "fatigue_risk": 0.2,
                           "repetition_density": 0.1})
    text = panel.render()
    assert "Emphasis" in text and "Repetition" in text and "POST" in text
    plain = MeterPanel("Juicy Punch").render()
    assert "Punch" in plain and "Mono Safety" in plain


def test_accent_hue_deterministic_in_band():
    h1 = accent_hue_from_title("Juicy Punch")
    h2 = accent_hue_from_title("Juicy Punch")
    assert h1 == h2
    assert 0.54 <= h1 <= 0.60

from juicy_tpu.ui.meters import MeterPanel, MetricStats

__all__ = ["MeterPanel", "MetricStats"]

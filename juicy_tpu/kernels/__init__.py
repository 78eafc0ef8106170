from juicy_tpu.kernels.analyzer_kernel import analyze_fused_available

__all__ = ["analyze_fused_available"]

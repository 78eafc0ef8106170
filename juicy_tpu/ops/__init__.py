from juicy_tpu.ops.scan_utils import linear_scan, onepole_lowpass, leaky_integrator
from juicy_tpu.ops.envelopes import ar_envelope, ar_envelope_final
from juicy_tpu.ops.noise import lcg_sequence, lcg_advance, white_from_bits
from juicy_tpu.ops.delays import block_delay_read, update_tail_window
from juicy_tpu.ops.shapers import mid_side_encode, mid_side_decode

__all__ = [
    "linear_scan",
    "onepole_lowpass",
    "leaky_integrator",
    "ar_envelope",
    "ar_envelope_final",
    "lcg_sequence",
    "lcg_advance",
    "white_from_bits",
    "block_delay_read",
    "update_tail_window",
    "mid_side_encode",
    "mid_side_decode",
]

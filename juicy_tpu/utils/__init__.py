from juicy_tpu.utils.convert import (
    db_to_gain,
    gain_to_db,
    jlimit,
    jmap,
    jmap5,
    onepole_coeff,
    tau_coeff,
)

__all__ = [
    "db_to_gain",
    "gain_to_db",
    "jlimit",
    "jmap",
    "jmap5",
    "onepole_coeff",
    "tau_coeff",
]

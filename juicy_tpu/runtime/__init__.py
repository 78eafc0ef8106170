from juicy_tpu.runtime.plugin import Plugin, Chain
from juicy_tpu.runtime.state import save_state, load_state

__all__ = ["Plugin", "Chain", "save_state", "load_state"]

from .diode import (  # noqa: F401
    DiodeHyperParams,
    DiodeState,
    diode_init,
    diode_mix,
    diode_update,
)
from .galore import GaLoreConfig  # noqa: F401

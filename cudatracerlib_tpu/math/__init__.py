from . import (  # noqa: F401
    compression,
    frame,
    fresnel,
    kernels,
    microfacet,
    montecarlo,
    spectrum,
    vecmath,
    warp,
)
from .frame import Frame  # noqa: F401

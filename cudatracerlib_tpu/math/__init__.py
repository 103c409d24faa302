from . import (  # noqa: F401
    compression,
    frame,
    fresnel,
    kernels,
    microfacet,
    montecarlo,
    quadrature,
    spectrum,
    spline,
    vecmath,
    warp,
)
from .frame import Frame  # noqa: F401

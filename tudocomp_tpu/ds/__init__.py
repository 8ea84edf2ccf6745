from tudocomp_tpu.ds.suffix import (  # noqa: F401
    suffix_array,
    inverse_suffix_array,
    phi_array,
    plcp_array,
    lcp_array,
    TextDS,
)
from tudocomp_tpu.ds.bwt import bwt_forward, bwt_decode  # noqa: F401

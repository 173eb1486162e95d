"""Vectorized filter kernels + declarative chain specs.

``kernels`` holds the per-filter pandas kernels (reference-parity
semantics); ``spec`` compiles declarative chain/mapper specs into fused
kernels; ``native`` builds pure-``Column`` fast paths for chains whose
every step has a bit-identical JVM expression.
"""

from filters_spark.functions.spec import (  # noqa: F401
    ChainKernel,
    FilterSpecError,
    MapperKernel,
    RepeaterKernel,
    compile_chain,
    compile_mapper,
    register_kernel,
    run_one,
)

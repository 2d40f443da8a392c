"""Command-line tools mirroring the reference's seven executables
(reference Sources/{PIRGenerateDatabase,PIRProcessDatabase,PIRShardDatabase,
PNNSGenerateDatabase,PNNSProcessDatabase,SimplePIRProcessDatabase,MMapTool}).

Run as: python -m she_tpu.cli.<tool> [args]
"""

import os

# Some environments register accelerator plugins via sitecustomize and
# override jax_platforms programmatically; restore the standard env-var
# semantics so `JAX_PLATFORMS=cpu python -m she_tpu.cli...` works.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

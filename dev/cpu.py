"""Dev helper: `python -c "import dev.cpu; ..."` or import first in scripts to
force the CPU backend (the image's sitecustomize pins JAX_PLATFORMS=axon)."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

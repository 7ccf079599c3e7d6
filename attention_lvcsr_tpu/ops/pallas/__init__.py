"""Pallas TPU kernels for the hot compute paths."""
import os

# The TPU compile helper requires worker hostnames; in single-host
# environments (incl. the tunneled dev chip) an empty value breaks Mosaic
# kernel compilation with a confusing error — default it here.
if not os.environ.get("TPU_WORKER_HOSTNAMES"):
    os.environ["TPU_WORKER_HOSTNAMES"] = "localhost"

#!/bin/sh
# Run the real-TPU test subset (pytest -m tpu) on the chip.
# The default suite forces a virtual CPU mesh (tests/conftest.py);
# TRAJCRAFTER_TPU_TESTS=1 keeps the accelerator platform instead.
set -e
cd "$(dirname "$0")/.."
TRAJCRAFTER_TPU_TESTS=1 exec python -m pytest tests -m tpu "$@"

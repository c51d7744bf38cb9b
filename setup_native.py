"""Build the native hostops extension:

    python setup_native.py build_ext --inplace

Produces ``trajectorycrafter_tpu/hostops*.so``; utils/video.py picks it up
automatically (numpy fallback when absent).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="trajectorycrafter-tpu-hostops",
    ext_modules=[
        Extension(
            "trajectorycrafter_tpu.hostops",
            sources=["native/hostops.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-fno-math-errno"],
        )
    ],
    script_args=["build_ext", "--inplace"],
)

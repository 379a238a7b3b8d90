from setuptools import find_packages, setup

setup(
    name="torchao_tpu",
    version=open("version.txt").read().strip(),
    description=(
        "TPU-native quantized inference & low-precision training "
        "(JAX/XLA/Pallas) with torchao-equivalent capabilities"
    ),
    packages=find_packages(include=["torchao_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "ml_dtypes"],
    extras_require={
        "full": ["optax", "orbax-checkpoint", "flax", "einops"],
    },
)

from setuptools import find_packages, setup

setup(
    name="glabc_tpu",
    version="0.1.0",
    description=(
        "TPU-native likelihood-free inference engine: global-local ABC-MCMC "
        "samplers (GlobalMCMC, GLMCMC, GLMALA, GLMCMC-NF, AGLMCMC) as "
        "jit-compiled JAX scan kernels with vmapped chains, Pallas fused "
        "transition kernels, and shard_map multi-chip scaling"
    ),
    packages=find_packages(exclude=["tests", "examples"]),
    python_requires=">=3.10",
    install_requires=[
        "jax>=0.4.30",
        "numpy",
        "optax>=0.2",
    ],
    extras_require={
        "plots": ["matplotlib>=3.8", "seaborn>=0.13"],
        "test": ["pytest", "scipy>=1.8"],
    },
)

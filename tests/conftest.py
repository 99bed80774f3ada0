"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "multi-node without a cluster" mechanism (SURVEY.md §4): sharding
tests exercise real collectives over 8 XLA host devices. Must run before any
JAX backend client is created.
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (remote TPU
# tunnel); tests must be hermetic and fast, so pin to CPU.
jax.config.update("jax_platforms", "cpu")

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's two-phase strategy (SURVEY.md §4): Python graph
generation + executor conformance against plain-math oracles. Multi-chip
sharding is validated on host-platform virtual devices, as the driver's
``dryrun_multichip`` does.
"""

import os

# Force CPU: the session environment may pre-set JAX_PLATFORMS to a real
# TPU tunnel (and its bootstrap pins the config after importing jax, so the
# env var alone is not enough — override via jax.config below).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: FHE task graphs are deep elementwise
# programs; caching compiles across test runs cuts suite time drastically.
# Repo-local (gitignored): /tmp is wiped between operator sessions and a
# cold suite pays every deep-graph compile again.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.cache', 'jax')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

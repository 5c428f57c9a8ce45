"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's two-phase strategy (SURVEY.md §4): Python graph
generation + executor conformance against plain-math oracles. Multi-chip
sharding is validated on host-platform virtual devices, as the driver's
``dryrun_multichip`` does.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

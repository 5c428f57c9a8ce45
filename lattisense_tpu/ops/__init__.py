"""Pallas device kernels.

Status: the fused NTT (ntt_pallas.ntt_fused) is bit-exact in interpret
mode; on the real chip the Mosaic lowering of the 14-stage unrolled kernel
currently dies in a deep abstract-eval recursion inside the remote-compile
path (tracked for round 2: split into two 7-stage kernels or restructure
the stage unroll). The XLA path in core/ntt.py remains the production
device NTT.
"""

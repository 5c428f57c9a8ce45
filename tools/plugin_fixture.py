"""Fixture writer/reader for the C ABI plug-in client (csrc/plugin_client).

Binary formats (little-endian; magics 'LSTC'/'LSTK'/'LSTG'):

  ct:  u32 magic, u32 level, u32 degree, u32 n_component, u32 n,
       (degree+1)*n_component*n u64 coefficients (limb-major)
  ksk: u32 magic, u32 n_public_key, u32 level, u32 n_component, u32 n,
       n_public_key * 2 * n_component * n u64
  glk: u32 magic, u32 n_key, u32 n_public_key, u32 level,
       u32 n_component, u32 n, then per key: u64 galois_element +
       n_public_key * 2 * n_component * n u64

Keys are serialized as PLAIN NTT residues (mf_nbits=0 exchange,
cxx_abi_bridge_executors.h:70): the runner re-enters Montgomery form at
import, exactly like a real foreign library's export would."""

import struct

import numpy as np

CT_MAGIC = 0x4354534C
KSK_MAGIC = 0x4B54534C
GLK_MAGIC = 0x4754534C


def write_ct(path: str, ct) -> None:
    data = np.ascontiguousarray(np.asarray(ct.data), dtype='<u8')
    deg, L, n = data.shape[0] - 1, data.shape[1], data.shape[2]
    with open(path, 'wb') as f:
        f.write(struct.pack('<5I', CT_MAGIC, ct.level, deg, L, n))
        f.write(data.tobytes())


def read_ct(path: str):
    from lattisense_tpu.schemes.types import Ciphertext
    with open(path, 'rb') as f:
        magic, level, deg, L, n = struct.unpack('<5I', f.read(20))
        assert magic == CT_MAGIC, 'bad ct magic'
        data = np.frombuffer(f.read(8 * (deg + 1) * L * n),
                             dtype='<u8').reshape(deg + 1, L, n)
    return Ciphertext(data=data.astype(np.uint64), level=level)


def _ksk_plain(ksk, qp_ring) -> np.ndarray:
    from lattisense_tpu.core import u64 as _u
    kq = np.asarray(ksk.key_q)
    kp = np.asarray(ksk.key_p)
    data = np.concatenate([kq, kp], axis=2)        # (β, 2, T, n)
    return _u.from_mont(np, data.astype(np.uint64), qp_ring.q, qp_ring.pinv)


def write_ksk(path: str, ksk, qp_ring) -> None:
    data = np.ascontiguousarray(_ksk_plain(ksk, qp_ring), dtype='<u8')
    beta, _, T, n = data.shape
    with open(path, 'wb') as f:
        f.write(struct.pack('<5I', KSK_MAGIC, beta, T - 1, T, n))
        f.write(data.tobytes())


def write_glk(path: str, glk: dict, qp_ring) -> None:
    elements = sorted(glk.keys())
    datas = [np.ascontiguousarray(_ksk_plain(glk[e], qp_ring), dtype='<u8')
             for e in elements]
    beta, _, T, n = datas[0].shape
    with open(path, 'wb') as f:
        f.write(struct.pack('<6I', GLK_MAGIC, len(elements), beta, T - 1,
                            T, n))
        for elt, data in zip(elements, datas):
            f.write(struct.pack('<Q', elt))
            f.write(data.tobytes())

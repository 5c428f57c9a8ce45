"""ForeignTask: FheTask re-implemented over foreign raw-RNS C structs.

Mirror of the reference SEAL plug-in's FheTaskGpu::run contract
(plug-in/SEAL/acc/runner.{h,cpp}): the caller owns only C ABI structs
(CCiphertext / CPlaintext / CRelinKey / CGaloisKey from abi.py — the
layout a real SEAL/Lattigo build exports via
plug-in/SEAL/acc/c_struct_import_export.h) and never touches framework
types. ForeignTask:

1. loads the compiled task directory (task_signature.json + mega_ag.json),
2. signature-checks the foreign arguments with the reference plug-in's
   verbatim error strings (plug-in/SEAL/acc/check_sig.h:38-96),
3. checks the key signature levels (check_key_signatures, :76-96),
4. imports structs → arrays, runs the jitted task, exports outputs as
   fresh CCiphertext structs the caller can import into its own library.

Montgomery-form control mirrors mf_nbits (cxx_abi_bridge_executors.h:70):
foreign data is plain NTT/coeff residues (mf_nbits=0 keys re-enter
Montgomery form at import).
"""

import json
import os

import numpy as np

from .. import abi
from ..core.modring import get_rns_ring
from ..params import params_from_task_json
from ..runtime.task import FheTaskTpu
from ..schemes.types import GaloisKeys

_TYPE_OF_STRUCT = {
    abi.CCiphertext: 'ct',
    abi.CPlaintext: 'pt',
}
# the reference plug-in collapses pt variants onto PLAINTEXT
# (str_seal_argument_type_map, plug-in/SEAL/acc/check_sig.h:32)
_COMPATIBLE = {'ct': {'ct'}, 'pt': {'pt', 'pt_ringt'}}


def _flatten(nested):
    if isinstance(nested, (list, tuple)):
        out = []
        for x in nested:
            out += _flatten(x)
        return out
    return [nested]


class ForeignVectorArgument:
    """(arg_id, nested C structs) with flat homogeneous-type/level checks —
    the SealVectorArgument analog (plug-in/SEAL/acc/argument.h)."""

    def __init__(self, arg_id: str, structs):
        self.arg_id = arg_id
        self.flat = _flatten(structs)
        if not self.flat:
            raise ValueError(f'argument {arg_id} is empty')
        kinds = {type(s) for s in self.flat}
        if len(kinds) > 1:
            raise TypeError(f'argument {arg_id} mixes struct types: {kinds}')
        kind = kinds.pop()
        if kind not in _TYPE_OF_STRUCT:
            raise TypeError(f'argument {arg_id}: unsupported struct {kind}')
        self.type = _TYPE_OF_STRUCT[kind]
        levels = {int(s.level) for s in self.flat}
        if len(levels) > 1:
            raise ValueError(f'argument {arg_id} mixes levels: {levels}')
        self.level = levels.pop()


class ForeignTask:
    """Run a compiled task on foreign buffers (reference FheTaskGpu shape)."""

    def __init__(self, task_dir: str, mode: str = 'jit'):
        self.task = FheTaskTpu(task_dir, mode=mode)
        with open(os.path.join(task_dir, 'task_signature.json')) as f:
            self.signature = json.load(f)
        with open(os.path.join(task_dir, 'mega_ag.json')) as f:
            self.param_json = json.load(f)['parameter']
        self.params = params_from_task_json(self.param_json)
        self._qp_ring = get_rns_ring(tuple(self.params.q) + tuple(self.params.p),
                                     self.params.n)

    # ---- signature checks (verbatim reference plug-in error strings) -----
    def _check_with_sig(self, arg: ForeignVectorArgument, row: dict):
        if arg.arg_id != row['id']:
            raise RuntimeError(
                f'For argument {arg.arg_id}, expected id is {row["id"]}, '
                f'but input id is {arg.arg_id}.')
        if row['type'] not in _COMPATIBLE[arg.type]:
            raise RuntimeError(
                f'For argument {arg.arg_id}, expected type is {row["type"]}, '
                f'but input type is {arg.type}.')
        expected_size = 1
        for x in row['size']:
            expected_size *= x
        if len(arg.flat) != expected_size:
            raise RuntimeError(
                f'For argument {arg.arg_id}, expected size is {expected_size}, '
                f'but input size is {len(arg.flat)}.')
        if arg.level != row['level']:
            raise RuntimeError(
                f'For argument {arg.arg_id}, expected level is {row["level"]}, '
                f'but input level is {arg.level}.')

    def _check_key_signatures(self, rlk, glk):
        key_sig = self.signature.get('key', {})
        rlk_level_sig = key_sig.get('rlk', -1)
        if rlk_level_sig >= 0:
            if rlk is None:
                raise RuntimeError(
                    'Level of relin key is smaller than the expected level.')
            rlk_level = rlk.public_keys[0].polys[0].n_component \
                - len(self.params.p) - 1
            if rlk_level_sig > rlk_level:
                raise RuntimeError(
                    'Level of relin key is smaller than the expected level.')
        glk_sig = key_sig.get('glk', {})
        if glk_sig:
            present = {}
            if glk is not None:
                for i in range(glk.n_key_switch_key):
                    ksk = glk.key_switch_keys[i]
                    present[int(glk.galois_elements[i])] = \
                        ksk.public_keys[0].polys[0].n_component \
                        - len(self.params.p) - 1
            for elt_str, lvl in glk_sig.items():
                elt = int(elt_str)
                if elt not in present or lvl > present[elt]:
                    raise RuntimeError(
                        'Level of Galois key is smaller than the expected '
                        'level.')

    # ---- run -------------------------------------------------------------
    def run(self, rlk=None, glk=None, args=(), mf_nbits: int = 0):
        """args: list of ForeignVectorArgument, positional per the online-in
        signature rows. Returns ({output_id: CCiphertext _Exported}, ns)."""
        # reference semantics (plug-in/SEAL/acc/check_sig.h:209-211 and
        # cxx_sdk_v2/check_sig.h:244-246): when the offline signature is
        # non-empty it REPLACES the online one for argument checking.
        offline = self.signature.get('offline', [])
        rows = offline if offline else self.signature['online']
        in_rows = [r for r in rows if r['phase'] in ('in', 'offline')]
        if len(args) != len(in_rows):
            raise RuntimeError(f'expected {len(in_rows)} arguments, '
                               f'got {len(args)}.')
        for arg, row in zip(args, in_rows):
            self._check_with_sig(arg, row)
        self._check_key_signatures(rlk, glk)

        ctx = self._import_context(rlk, glk, mf_nbits)
        input_values = {}
        is_ckks = self.signature.get('algorithm') == 'CKKS'
        for arg, row in zip(args, in_rows):
            vals = [self._import_one(s, arg.type, is_ckks) for s in arg.flat]
            input_values[row['id']] = self._reshape(vals, row['size'])
        outputs, ns = self.task.run(ctx, input_values)
        exported = {}
        for oid, val in outputs.items():
            flat = _flatten(val if isinstance(val, list) else [val])
            exp = [abi.export_ciphertext(self._host_ct(v)) for v in flat]
            exported[oid] = exp[0] if len(exp) == 1 else exp
        return exported, ns

    # ---- helpers ---------------------------------------------------------
    def _import_context(self, rlk, glk, mf_nbits):
        from ..params import BfvParams
        from ..runtime.context import BfvContext, CkksContext
        cls = BfvContext if isinstance(self.params, BfvParams) else CkksContext
        ctx = cls.create_empty_context(self.params)
        level = self.params.max_level
        sp_level = len(self.params.p) - 1
        if rlk is not None:
            ctx.rlk = abi.import_keyswitch_key(rlk, level, sp_level,
                                               mf_nbits, self._qp_ring)
        if glk is not None:
            ctx.glk = GaloisKeys(abi.import_galois_keys(
                glk, level, sp_level, mf_nbits, self._qp_ring))
        return ctx

    def _import_one(self, struct, kind, is_ckks):
        scale = float(self.param_json.get('scale', 1.0))
        if kind == 'ct':
            return abi.import_ciphertext(struct, is_ntt=is_ckks, scale=scale)
        return abi.import_plaintext(struct, is_ntt=is_ckks, scale=scale)

    @staticmethod
    def _reshape(vals, size):
        if size == [1]:
            return vals[0]
        out = vals
        for dim in reversed(size[1:]):
            out = [out[i:i + dim] for i in range(0, len(out), dim)]
        return out

    @staticmethod
    def _host_ct(v):
        import numpy as _np
        from ..schemes.types import Ciphertext
        return Ciphertext(data=_np.asarray(v.data), level=v.level,
                          is_ntt=v.is_ntt, is_mform=v.is_mform,
                          scale=getattr(v, 'scale', 1.0))

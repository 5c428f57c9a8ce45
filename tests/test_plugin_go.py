"""Go offload adapter (plugin/go): the Lattigo-plug-in analog, gated on a
Go toolchain being present (absent from the CI image — reference
counterpart `plug-in/lattigo/acc/*_test.go` runs on the reference's own
CI runner, SURVEY §2.6).

When `go` exists: build `plugin/go/cmd/runtask` (cgo against
liblattisense_plugin.so) and drive the same compiled bfv
mult_relin+rotate task + binary fixtures as the C++ client
(tests/test_plugin_capi.py), asserting the verbatim wrong-level error
through the Go pre-flight and decrypt-to-oracle on the output."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import lattisense_tpu  # noqa: F401
from lattisense_tpu.core.modring import gen_ntt_primes, get_rns_ring
from lattisense_tpu.frontend import custom_task as ctk
from lattisense_tpu.frontend.custom_task import BfvParam
from lattisense_tpu.params import BfvParams
from lattisense_tpu.runtime import BfvContext

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from tools import plugin_fixture as fx  # noqa: E402

N, T = 64, 65537
ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
CSRC = os.path.join(ROOT, 'csrc')
GODIR = os.path.join(ROOT, 'plugin', 'go')


@pytest.fixture(scope='module')
def go_client(tmp_path_factory):
    if shutil.which('go') is None:
        pytest.skip('no Go toolchain in image (environmental; '
                    'plugin/go is source-complete)')
    if shutil.which('g++') is None:
        pytest.skip('no g++ toolchain')
    r = subprocess.run(['make', '-C', CSRC, 'plugin'],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f'plugin build failed: {r.stderr[-500:]}')
    out = str(tmp_path_factory.mktemp('gobuild') / 'runtask')
    r = subprocess.run(['go', 'build', '-o', out, './cmd/runtask'],
                       cwd=GODIR, capture_output=True, text=True)
    assert r.returncode == 0, f'go build failed:\n{r.stderr[-2000:]}'
    return out


def test_go_client_end_to_end(go_client, tmp_path):
    q = gen_ntt_primes(N, 50, 4)
    p = gen_ntt_primes(N, 51, 2, exclude=tuple(q))
    params = BfvParams.create_custom(N, T, q, p)
    level = 2

    task_dir = tmp_path / 'task'
    task_dir.mkdir()
    fe = BfvParam.create_custom_param(N, list(q), list(p), T)
    ctk.set_fhe_param(fe)
    x = ctk.BfvCiphertextNode('x', level)
    y = ctk.BfvCiphertextNode('y', level)
    z = ctk.mult_relin(x, y, 'z')
    w = ctk.rotate_cols(z, 1, 'w')
    ctk.process_custom_task([ctk.Argument('x', x), ctk.Argument('y', y)],
                            [ctk.Argument('w', w)],
                            output_instruction_path=str(task_dir))

    ctx = BfvContext.create_random_context(params, seed=91)
    ctx.gen_rotation_keys_for_rotations([1])
    rng = np.random.default_rng(7)
    m1 = rng.integers(0, T, N, dtype=np.uint64)
    m2 = rng.integers(0, T, N, dtype=np.uint64)

    fix = tmp_path / 'fixtures'
    fix.mkdir()
    fx.write_ct(str(fix / 'x.ct'), ctx.encrypt(ctx.encode(m1, level)))
    fx.write_ct(str(fix / 'y.ct'), ctx.encrypt(ctx.encode(m2, level)))
    fx.write_ct(str(fix / 'x_badlevel.ct'),
                ctx.encrypt(ctx.encode(m1, level - 1)))
    qp_ring = get_rns_ring(tuple(q) + tuple(p), N)
    fx.write_ksk(str(fix / 'rlk.key'), ctx.rlk, qp_ring)
    fx.write_glk(str(fix / 'glk.key'), ctx.glk.keys, qp_ring)

    out_ct = tmp_path / 'w.ct'
    env = dict(os.environ)
    env['PYTHONPATH'] = ROOT
    env['LATTISENSE_PLUGIN_PLATFORM'] = 'cpu'
    env['JAX_PLATFORMS'] = 'cpu'
    env['LD_LIBRARY_PATH'] = CSRC + ':' + env.get('LD_LIBRARY_PATH', '')
    r = subprocess.run([go_client, str(task_dir), str(fix), str(out_ct)],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, \
        f'go client failed rc={r.returncode}\nstdout:{r.stdout}\nstderr:{r.stderr}'
    assert 'go plugin client OK' in r.stdout

    back = fx.read_ct(str(out_ct))
    got = ctx.decrypt_decode(back)
    prod = (m1 * m2) % T
    half = N // 2
    expected = np.concatenate([np.roll(prod[:half], -1),
                               np.roll(prod[half:], -1)])
    np.testing.assert_array_equal(got, expected)

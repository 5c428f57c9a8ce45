"""Inspect a compiled task directory: op histogram, levels, key needs.

Usage: python tools/inspect_task.py <task_dir>

Reads the mega_ag.json / task_signature.json contract (the L5→L4 file
interface, frontend/custom_task.py:2414-2436) and prints what the runtime
will see — handy when a task fails signature checks or compiles slowly.
"""

import json
import os
import sys
from collections import Counter


def main(task_dir: str):
    with open(os.path.join(task_dir, 'mega_ag.json')) as f:
        mag = json.load(f)
    with open(os.path.join(task_dir, 'task_signature.json')) as f:
        sig = json.load(f)

    p = mag['parameter']
    chain = 'BFV' if 't' in p else 'CKKS'
    print(f"algorithm : {mag['algorithm']} (chain: {chain}, n={p['n']}, "
          f"{len(p['q'])} q + {len(p['p'])} p limbs)")
    data, compute = mag['data'], mag['compute']
    print(f"graph     : {len(data)} data nodes, {len(compute)} compute "
          f"nodes, {len(mag['inputs'])} inputs, {len(mag['outputs'])} "
          f"outputs, {len(mag.get('offline_inputs', []))} offline")

    ops = Counter(c['type'] for c in compute.values())
    customs = Counter(c['type'] for c in compute.values()
                      if c.get('is_custom'))
    print('ops       : ' + ', '.join(f'{k}×{v}'
                                     for k, v in ops.most_common()))
    if customs:
        print('customs   : ' + ', '.join(customs))

    levels = Counter(d.get('level') for d in data.values()
                     if d.get('level') is not None)
    print('levels    : ' + ', '.join(f'L{k}×{v}'
                                     for k, v in sorted(levels.items())))

    keys = [d for d in data.values() if d['type'] in ('rlk', 'glk', 'swk')]
    gals = sorted(d['galois_element'] for d in keys if d['type'] == 'glk')
    print(f"keys      : {sum(1 for d in keys if d['type'] == 'rlk')} rlk, "
          f"{len(gals)} glk (elements {gals[:8]}"
          f"{'…' if len(gals) > 8 else ''}), "
          f"{sum(1 for d in keys if d['type'] == 'swk')} swk")

    key_sig = sig.get('key', {})
    if key_sig:
        print(f"key sig   : rlk@L{key_sig.get('rlk')}, "
              f"{len(key_sig.get('glk', {}))} glk entries"
              + (', btp swks' if key_sig.get('ckks_btp_swk') else ''))
    for phase in ('online', 'offline'):
        rows = sig.get(phase, [])
        if not rows:
            continue
        print(f'{phase:<9s} :')
        for r in rows:
            print(f"  {r['id']:>16s}  {r['type']:<10s} "
                  f"size={r.get('size')} level={r.get('level')} "
                  f"({r.get('phase')})")


if __name__ == '__main__':
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    main(sys.argv[1])

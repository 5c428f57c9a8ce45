"""Plot memory-monitor CSVs (reference parity: tools/plot_mem.py —
auto-detects host vs device columns).

Usage: python tools/plot_mem.py mem_usage_tpu_0.csv [...]
"""

import sys

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    fig, ax = plt.subplots(figsize=(10, 5))
    ax2 = None
    for path in sys.argv[1:]:
        with open(path) as f:
            header = f.readline().strip().split(',')
            rows = [line.strip().split(',') for line in f if line.strip()]
        t = [float(r[0]) for r in rows]
        rss = [int(r[1]) / 1024 for r in rows]
        ax.plot(t, rss, label=f'{path} VmRSS (MB)')
        if 'device_bytes_in_use' in header:
            idx = header.index('device_bytes_in_use')
            dev = [int(r[idx]) / 2**20 for r in rows]
            ax2 = ax2 or ax.twinx()
            ax2.plot(t, dev, '--', label=f'{path} device (MB)')
    ax.set_xlabel('time (s)')
    ax.set_ylabel('host RSS (MB)')
    if ax2 is not None:
        ax2.set_ylabel('device memory (MB)')
    ax.legend(loc='upper left')
    out = 'mem_plot.png'
    fig.savefig(out, dpi=120, bbox_inches='tight')
    print(f'wrote {out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())

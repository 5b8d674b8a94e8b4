"""Corpus analysis: the numbers that seed config constants.

Capability rebuild of the ``stats/`` scripts (``DataBaker_gen_stat.py``,
``DataBaker_print_symbols.py``, ``DataBaker_print_pinyins.py``,
``thchs30_gen_vbanks.py``, ``inspect_preproc.py``): collects the symbol and
pinyin inventories of a corpus, measures the f0/c0 ranges that become the
quantizer bounds (``transtacos/hparam.py:22-25`` were produced exactly this
way), and summarizes durations.

Usage:
  python -m transtacos_retunegan_tpu.tools.corpus_stats --data_dir processed/
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter
from typing import Dict

import numpy as np

from ..config import Config
from ..text import g2p


def feature_ranges(data_dir: str) -> Dict[str, float]:
    """f0/c0 min-max over a preprocessed corpus -> quantizer bounds."""
    f0_min, f0_max = np.inf, -np.inf
    c0_min, c0_max = np.inf, -np.inf
    n = 0
    for fn in os.listdir(data_dir):
        if fn.startswith('f0-'):
            f0 = np.load(os.path.join(data_dir, fn))
            f0_min, f0_max = min(f0_min, float(f0.min())), max(f0_max, float(f0.max()))
            n += 1
        elif fn.startswith('c0-'):
            c0 = np.load(os.path.join(data_dir, fn))
            c0_min, c0_max = min(c0_min, float(c0.min())), max(c0_max, float(c0.max()))
    return {'f0min': f0_min, 'f0max': f0_max, 'c0min': c0_min, 'c0max': c0_max,
            'n_utterances': n}


def symbol_inventory(data_dir: str) -> Dict[str, Counter]:
    """Collect pinyin syllables and syl4 phones used by a corpus."""
    pinyins: Counter = Counter()
    phones: Counter = Counter()
    with open(os.path.join(data_dir, 'train.txt'), encoding='utf-8') as fh:
        for line in fh:
            parts = line.strip().split('|')
            if len(parts) != 3:
                continue
            for syl in parts[2].split(' '):
                pinyins[syl] += 1
            c, v, t, vx = g2p.to_syl4(parts[2])
            for lane in (c, v, vx):
                for ph in lane:
                    if ph != '_':
                        phones[ph] += 1
    return {'pinyins': pinyins, 'phones': phones}


def duration_stats(data_dir: str, cfg: Config) -> Dict[str, float]:
    lens = []
    for fn in os.listdir(data_dir):
        if fn.startswith('mel-'):
            lens.append(np.load(os.path.join(data_dir, fn), mmap_mode='r').shape[1])
    lens = np.asarray(lens)
    if len(lens) == 0:
        return {}
    sec = lens * cfg.audio.hop_length / cfg.audio.sample_rate
    return {'n': int(len(lens)), 'total_hours': float(sec.sum() / 3600),
            'min_frames': int(lens.min()), 'max_frames': int(lens.max()),
            'avg_frames': float(lens.mean())}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', required=True)
    args = p.parse_args()
    cfg = Config()
    out = {
        'feature_ranges': feature_ranges(args.data_dir),
        'durations': duration_stats(args.data_dir, cfg),
    }
    inv = symbol_inventory(args.data_dir)
    out['n_distinct_pinyins'] = len(inv['pinyins'])
    out['n_distinct_phones'] = len(inv['phones'])
    out['top_pinyins'] = inv['pinyins'].most_common(20)
    print(json.dumps(out, indent=2, default=str))


if __name__ == '__main__':
    main()

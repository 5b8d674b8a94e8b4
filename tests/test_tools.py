"""Light tests for the tools package (corpus stats, param counts)."""

import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.tools import corpus_stats, param_counts

pytestmark = pytest.mark.smoke


class TestCorpusStats:
    def test_feature_ranges_and_durations(self, tmp_path):
        rng = np.random.RandomState(0)
        for i in range(3):
            np.save(tmp_path / f'f0-u{i}.npy',
                    (100 + 50 * rng.rand(40)).astype(np.float32))
            np.save(tmp_path / f'c0-u{i}.npy',
                    (0.01 + 0.2 * rng.rand(40)).astype(np.float32))
            np.save(tmp_path / f'mel-u{i}.npy',
                    rng.randn(80, 40 + i).astype(np.float32))
        # on-disk contract is name|prds|text (see preprocess.write_metadata)
        (tmp_path / 'train.txt').write_text(
            'u0|04|ni3 hao3\nu1|04|zhong1 guo2\n', encoding='utf-8')

        r = corpus_stats.feature_ranges(str(tmp_path))
        assert 100 <= r['f0min'] <= r['f0max'] <= 150
        assert r['n_utterances'] == 3

        d = corpus_stats.duration_stats(str(tmp_path), Config())
        assert d['n'] == 3 and d['min_frames'] == 40

        inv = corpus_stats.symbol_inventory(str(tmp_path))
        assert inv['pinyins']['ni3'] == 1
        assert 'zh' in inv['phones']


class TestParamCounts:
    def test_reference_parity(self):
        counts = param_counts.generator_counts(Config())
        for name, ref in param_counts.REFERENCE.items():
            assert abs(counts[name] - ref) / ref < 0.001, (name, counts[name], ref)

    def test_acoustic_count_plausible(self):
        n = param_counts.acoustic_count(Config())
        assert 5_000_000 < n < 20_000_000

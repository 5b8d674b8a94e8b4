"""Unit coverage for the round-5 evidence tools (host-side logic)."""

import json

import numpy as np

from transtacos_retunegan_tpu.config import Config


class TestDecaySessionHelpers:
    def test_tf_ratio_mirrors_device_schedule(self):
        """Host-side tf_ratio_at == the jitted schedule at every phase."""
        import jax.numpy as jnp

        from transtacos_retunegan_tpu.tools.decay_session import tf_ratio_at
        from transtacos_retunegan_tpu.train.schedules import \
            teacher_forcing_ratio
        import dataclasses
        hp = dataclasses.replace(Config().acoustic, tf_start_decay=100,
                                 tf_decay=200)
        for step in (0, 99, 100, 150, 200, 299, 300, 1000):
            dev = float(teacher_forcing_ratio(jnp.asarray(step), hp))
            assert abs(tf_ratio_at(step, hp) - dev) < 1e-6, step


class TestCoverageDiagnosis:
    def test_classification_structural_vs_genuine(self):
        from transtacos_retunegan_tpu.tools.coverage_diagnosis import \
            diagnose_alignment
        # 4 tokens x 6 steps: token0 wins steps 0-2, token3 wins 3-5;
        # token1 has mass 2.4 spread (genuine skip), token2 mass 0.3
        # (structurally too short to win)
        a = np.zeros((4, 6))
        a[0, :3] = [0.6, 0.6, 0.5]
        a[3, 3:] = [0.5, 0.6, 0.6]
        a[1] = 0.4                                  # mass 2.4, never argmax
        a[2, :3] = 0.1                              # mass 0.3
        d = diagnose_alignment(a, ['a', 'b', 'c', 'd'], struct_thresh=1.0)
        kinds = {m['symbol']: m['kind'] for m in d['missed']}
        assert kinds == {'b': 'genuine_skip', 'c': 'structural'}
        assert d['coverage'] == 0.5
        # winnable set = winners + genuine-skippable = {0, 1, 3}
        # (values round to 4 decimals in the artifact)
        assert abs(d['coverage_winnable'] - 2 / 3) < 1e-3

    def test_full_coverage_no_misses(self):
        from transtacos_retunegan_tpu.tools.coverage_diagnosis import \
            diagnose_alignment
        a = np.eye(3)
        d = diagnose_alignment(a, list('abc'))
        assert d['coverage'] == 1.0 and d['missed'] == []


class TestVariantRanking:
    def test_leg_row_reads_artifacts(self, tmp_path):
        from transtacos_retunegan_tpu.tools.variant_ranking import (W_MSTFT,
                                                                    leg_row)
        d = tmp_path / 'gan_MelGAN'
        d.mkdir()
        (d / 'gan_loss.csv').write_text(
            'step,gen_total,mstft_weighted,msd_score_real,msd_score_fake\n'
            '10,100.0,80.0,0.9,0.1\n4590,90.0,84.0,1.0,0.0\n')
        (d / 'quality_eval.json').write_text(json.dumps({
            'vocoder_vs_gl': {'gan': {'mstft': 11.0, 'mcd': 77.0,
                                      'snr_db': -14.0, 'pesq_proxy': 2.6},
                              'gan_beats_gl': False}}))
        row = leg_row(str(tmp_path), 'MelGAN', 'gan_MelGAN')
        assert row['steps'] == 4590
        assert row['mstft_end'] == round(84.0 / W_MSTFT, 3)
        assert row['heldout_mstft'] == 11.0
        assert row['ref_anchor'] == 10.084


class TestServingLatency:
    def test_percentile_summary_and_outlier_classes(self):
        import time

        from transtacos_retunegan_tpu.tools.serving_latency import run_load
        calls = [0]

        def mostly_fast():
            calls[0] += 1
            time.sleep(0.25 if calls[0] == 120 else 0.004)

        out = run_load([mostly_fast, lambda: time.sleep(0.004)],
                       duration_s=2.0, warmup_s=0.3)
        assert not out['errors']
        assert out['steady_state']['n'] > 50
        assert out['steady_state']['p50_ms'] < 30
        # the injected 250 ms stall must surface as a classified outlier
        kinds = [o['kind'] for o in out['outliers_gt_3x_p50']]
        assert kinds and all(k in ('cohort_local', 'global_stall')
                             for k in kinds)

    def test_worker_error_recorded_not_raised(self):
        from transtacos_retunegan_tpu.tools.serving_latency import run_load

        def boom():
            raise ValueError('nope')

        out = run_load([boom], duration_s=0.5, warmup_s=0.0)
        assert out['errors'] and 'nope' in out['errors'][0]

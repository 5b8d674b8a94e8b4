"""Golden tests for the text frontend (phonology, G2P, serialization)."""

import numpy as np
import pytest

from transtacos_retunegan_tpu.text import frontend, g2p, phonology, symbols

pytestmark = pytest.mark.smoke


class TestPhonology:
    def test_inventory_sizes(self):
        pd = phonology.phonodict
        # 22 consonants (incl. the vacant initial), 23 vowels, 3 endings --
        # matches the reference Phonodict4 built from phonodict_cn.csv
        assert len(pd.consonants) == 22
        assert len(pd.vowels) == 23
        assert pd.endings == ['_N', '_NG', '_R']
        assert '_' in pd.consonants

    def test_basic_lookups(self):
        pd = phonology.phonodict
        assert pd['hui'] == ('h', 'uEi', '_')
        assert pd['zhang'] == ('zh', 'a', '_NG')
        assert pd['er'] == ('_', 'e', '_R')
        assert pd['yuan'] == ('_', 'vE', '_N')
        assert pd['wen'] == ('_', 'u', '_N')
        assert pd['bo'] == ('b', 'uo', '_')
        assert pd['zi'] == ('z', 'i0', '_')
        assert pd['shi'] == ('sh', 'iR', '_')
        assert pd['ju'] == ('j', 'v', '_')
        assert pd['xyz'] is None

    def test_vowel_inventory(self):
        expected = {'Ei', 'a', 'ai', 'ao', 'e', 'i', 'i0', 'iE', 'iR', 'ia',
                    'iao', 'io', 'iou', 'o', 'ou', 'u', 'uEi', 'ua', 'uai',
                    'ue', 'uo', 'v', 'vE'}
        assert set(phonology.phonodict.vowels) == expected


class TestG2P:
    def test_doc_example(self):
        # the reference's own doc example (transtacos/text/g2p.py:49-54)
        pinyin = 'zi3 se4 de hua1 er2 wei4 shen2 me zher4 yang4 yuan2'
        c, v, t, vx = g2p.to_syl4(pinyin)
        assert c == ['z', 's', 'd', 'h', '_', '_', 'sh', 'm', 'zh', '_', '_']
        assert v == ['i0', 'e', 'e', 'ua', 'e', 'uEi', 'e', 'e', 'e', 'ia', 'vE']
        assert t == ['3', '4', '5', '1', '2', '4', '2', '5', '4', '4', '2']
        assert vx == ['_', '_', '_', '_', '_R', '_', '_N', '_', '_R', '_NG', '_N']

    def test_roundtrip(self):
        pinyin = 'ni3 hao3 shi4 jie4'
        syl4 = g2p.to_syl4(pinyin)
        serial = g2p.from_syl4(syl4)
        assert serial.split(' ')[0] == 'ni3_'

    def test_unknown_syllable(self):
        c, v, t, vx = g2p.to_syl4('blorp1')
        assert c == ['?'] and v == ['?'] and t == ['?'] and vx == ['?']

    def test_r_ending_overrides(self):
        c, v, t, vx = g2p.to_syl4('wanr2')
        assert vx == ['_R'] and v == ['ua']


class TestSymbols:
    def test_pad_is_zero(self):
        tab = symbols.get_table('syl4')
        assert tab.symbol_to_id('_') == 0
        assert tab.symbols[:4] == ['_', '~', '/', '?']

    def test_vocab_size_stable(self):
        # 4 markers + (22 C + 23 V + 3 E, minus '_' which aliases pad) = 51
        assert symbols.get_vocab_size('syl4') == 51
        assert symbols.get_vocab_size('seq') == 4 + len(set('abcdefghijklmnopqrstuvwxyz 12345'))

    def test_unknown_maps_to_unk(self):
        tab = symbols.get_table('syl4')
        assert tab.symbol_to_id('nonexistent') == tab.unk_id

    def test_roundtrip(self):
        tab = symbols.get_table('syl4')
        for s in tab.symbols:
            assert tab.id_to_symbol(tab.symbol_to_id(s)) == s


class TestSerialization:
    def test_train_path(self):
        pinyin = 'ni3 hao3'
        seq, prds = frontend.serialize_train(pinyin, [1, 4])
        # ni3 -> n,i + sep; hao3 -> h,ao + sep; + EOS = 7 tokens
        assert seq.shape == (7, 2)
        tab = symbols.get_table('syl4')
        phones = tab.decode(seq[:, 0])
        assert phones == ['n', 'i', '/', 'h', 'ao', '/', '~']
        assert list(seq[:, 1]) == [3, 3, 0, 3, 3, 0, 0]
        # prosody: zeros backward-filled from the separators, EOS gets 5
        assert list(prds) == [1, 1, 1, 4, 4, 4, 5]

    def test_inference_path_matches_train_minus_prds(self):
        pinyin = 'zhong1 guo2'
        seq_i = frontend.serialize_inference(pinyin)
        seq_t, _ = frontend.serialize_train(pinyin, [0, 4])
        np.testing.assert_array_equal(seq_i, seq_t)

    def test_vacant_slots_skipped(self):
        seq = frontend.serialize_inference('er2')   # C and ending vacant... C vacant, V=e, Vx=_R
        tab = symbols.get_table('syl4')
        phones = tab.decode(seq[:, 0])
        assert phones == ['e', '_R', '/', '~']

    def test_prds_length_mismatch_raises(self):
        with pytest.raises(AssertionError):
            frontend.serialize_train('ni3 hao3', [1])

    def test_ids_in_range(self):
        seq, prds = frontend.serialize_train('wo3 men2 de5 peng2 you3', [0, 0, 1, 0, 4])
        assert seq[:, 0].min() >= 0 and seq[:, 0].max() < symbols.get_vocab_size()
        assert seq[:, 1].min() >= 0 and seq[:, 1].max() <= 5
        assert prds.min() >= 0 and prds.max() <= 5


class TestTextNorm:
    def test_clause_packing(self):
        txt = '你好，世界！这是一个测试。'
        segs = frontend.normalize_text(txt)
        assert segs == ['你好世界这是一个测试']

    def test_long_clause_split(self):
        txt = '，'.join(['一二三四五六七八九十'] * 3)
        segs = frontend.normalize_text(txt)
        assert len(segs) == 3 or all(len(s) < 20 + 10 for s in segs)

    def test_ignore_punct(self):
        segs = frontend.normalize_text('你好、世界：测试；')
        assert segs == ['你好世界测试']

    def test_looks_like_pinyin(self):
        assert frontend.looks_like_pinyin('ni3 hao3')
        assert frontend.looks_like_pinyin('zhong1 guo2 ren2')
        assert not frontend.looks_like_pinyin('你好')

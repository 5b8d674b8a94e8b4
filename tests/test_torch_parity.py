"""Weight-transplant numerical parity against the importable torch reference.

The reference's ``retunegan/models/generator.py`` / ``discrminator.py`` are
plain PyTorch (torch 2.13 CPU is in this image); these tests instantiate the
actual reference modules, transplant their randomly initialized weights into
the flax rebuilds via ``transtacos_retunegan_tpu.interop``, and assert the
outputs agree to f32 tolerance over several shapes.  This pins the conv
semantics (padding arithmetic, transposed-conv layout, grouped convs, reflect
folds, weight-norm math) to the reference bit-for-bit -- param counts and
descent tests alone cannot catch a sign or pad slip.

The reference package is imported by file path with bytecode writing disabled
(``/root/reference`` is read-only and must stay untouched).
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transtacos_retunegan_tpu import interop  # noqa: E402
from transtacos_retunegan_tpu.config import Config  # noqa: E402
from transtacos_retunegan_tpu.models import discriminators as D  # noqa: E402
from transtacos_retunegan_tpu.models import generators as G  # noqa: E402

REF_DIR = '/root/reference/retunegan'


def _load_ref_module(name, relpath):
    """Import a reference source file standalone (skipping the package
    ``models/__init__.py``, which pulls librosa via loss.py)."""
    sys.dont_write_bytecode = True
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)   # for its `import hparam` / `from utils import *`
    spec = importlib.util.spec_from_file_location(name, f'{REF_DIR}/{relpath}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_gen():
    return _load_ref_module('_ref_generator', 'models/generator.py')


@pytest.fixture(scope='module')
def ref_disc():
    return _load_ref_module('_ref_discriminator', 'models/discrminator.py')


@pytest.fixture(scope='module')
def cfg():
    return Config()


def _seed(n=0):
    torch.manual_seed(1234 + n)


def _assert_close(a, b, tol=1e-4, what=''):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f'{what}: {a.shape} vs {b.shape}'
    d = np.max(np.abs(a - b))
    assert d <= tol, f'{what}: max |delta| = {d:.3e} > {tol}'


def _zero_noise(sd):
    """Zero the GaussianNoise weight so torch's always-on noise injection
    (``generator.py:19-30``) is inert and matches flax train=False."""
    for k in sd:
        if k == 'noise.w' or k.endswith('.noise.w'):
            sd[k] = torch.zeros_like(sd[k])
    return sd


@pytest.mark.parametrize('frames', [13, 32])
def test_refinegan_small_transplant(ref_gen, cfg, frames):
    _seed(frames)
    tg = ref_gen.Generator_RefineGAN_small().eval()
    sd = _zero_noise(tg.state_dict())
    tg.load_state_dict(sd)

    hop = cfg.audio.hop_length
    mel_t = torch.randn(2, 80, frames)
    tmpl_t = torch.rand(2, 1, frames * hop) * 2 - 1
    with torch.no_grad():
        out_t = tg(mel_t, tmpl_t).numpy()            # [B, 1, S]

    params = interop.import_generator_state_dict(sd, 'RefineGAN_small')
    fg = G.GeneratorRefineGANSmall(cfg)
    mel_j = jnp.asarray(mel_t.numpy().transpose(0, 2, 1))       # [B, T, 80]
    tmpl_j = jnp.asarray(tmpl_t.numpy().transpose(0, 2, 1))     # [B, S, 1]
    out_j = fg.apply({'params': params}, mel_j, tmpl_j, train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], what='RefineGAN_small out')


def test_hifigan_transplant(ref_gen, cfg):
    _seed(7)
    tg = ref_gen.Generator_HiFiGAN().eval()
    sd = tg.state_dict()

    mel_t = torch.randn(2, 80, 17)
    with torch.no_grad():
        out_t = tg(mel_t).numpy()

    params = interop.import_generator_state_dict(sd, 'HiFiGAN')
    fg = G.GeneratorHiFiGAN(cfg)
    out_j = fg.apply({'params': params},
                     jnp.asarray(mel_t.numpy().transpose(0, 2, 1)), None,
                     train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], what='HiFiGAN out')


def test_melgan_transplant(ref_gen, cfg):
    _seed(11)
    tg = ref_gen.Generator_MelGAN().eval()
    sd = tg.state_dict()

    mel_t = torch.randn(1, 80, 19)
    with torch.no_grad():
        out_t = tg(mel_t).numpy()

    params = interop.import_generator_state_dict(sd, 'MelGAN')
    fg = G.GeneratorMelGAN(cfg)
    out_j = fg.apply({'params': params},
                     jnp.asarray(mel_t.numpy().transpose(0, 2, 1)), None,
                     train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], what='MelGAN out')


# (map name, torch class, flax class) for every (mel, tmpl) -> wav variant.
# The Retune family's dual-branch fuse with learnable alpha and the template
# down-branches (reference ``generator.py:262-340,799-898``) are the places a
# sign/pad slip survives shape tests -- transplant parity pins them exactly.
MEL_TMPL_VARIANTS = [
    ('RetuneCNN', 'Generator_RetuneCNN', 'GeneratorRetuneCNN'),
    ('HiFiGAN_mini', 'Generator_HiFiGAN_mini', 'GeneratorHiFiGANMini'),
    ('HiFiGAN_micro', 'Generator_HiFiGAN_micro', 'GeneratorHiFiGANMicro'),
    ('HiFiGAN_mu', 'Generator_HiFiGAN_mu', 'GeneratorHiFiGANMu'),
    ('MelGANRetune', 'Generator_MelGANRetune', 'GeneratorMelGANRetune'),
    ('HiFiGANRetune', 'Generator_HiFiGANRetune', 'GeneratorHiFiGANRetune'),
    ('RefineGAN', 'Generator_RefineGAN', 'GeneratorRefineGAN'),
]


@pytest.mark.parametrize('ver,tcls,fcls', MEL_TMPL_VARIANTS)
def test_generator_variant_transplant(ref_gen, cfg, ver, tcls, fcls):
    _seed(hash(ver) % 1000)
    tg = getattr(ref_gen, tcls)().eval()
    sd = _zero_noise(tg.state_dict())
    tg.load_state_dict(sd)

    frames = 13
    hop = cfg.audio.hop_length
    mel_t = torch.randn(2, 80, frames)
    tmpl_t = torch.rand(2, 1, frames * hop) * 2 - 1
    with torch.no_grad():
        out_t = tg(mel_t, tmpl_t).numpy()

    params = interop.import_generator_state_dict(sd, ver)
    fg = getattr(G, fcls)(cfg)
    out_j = fg.apply({'params': params},
                     jnp.asarray(mel_t.numpy().transpose(0, 2, 1)),
                     jnp.asarray(tmpl_t.numpy().transpose(0, 2, 1)),
                     train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], tol=2e-4,
                  what=f'{ver} out')


@pytest.mark.parametrize('ver,tcls,fcls', [
    ('MelGANSplit', 'Generator_MelGANSplit', 'GeneratorMelGANSplit'),
    ('HiFiGANSplit', 'Generator_HiFiGANSplit', 'GeneratorHiFiGANSplit'),
])
def test_split_variant_transplant(ref_gen, cfg, ver, tcls, fcls):
    """u/v masked-sum + conjunction-refine parity (reference
    ``generator.py:343-386,901-942``): both sub-generators, the mask
    combination, and the refine tail transplant exactly."""
    _seed(hash(ver) % 1000)
    tg = getattr(ref_gen, tcls)().eval()
    sd = tg.state_dict()

    frames = 9
    hop = cfg.audio.hop_length
    mel_c = torch.randn(2, 80, frames)
    mel_v = torch.randn(2, 80, frames)
    tmpl = torch.rand(2, 1, frames * hop) * 2 - 1
    uv = (torch.rand(2, frames * hop) > 0.5).float()
    with torch.no_grad():
        out_t = tg(mel_c, mel_v, tmpl, tmpl, uv).numpy()

    params = interop.import_generator_state_dict(sd, ver)
    fg = getattr(G, fcls)(cfg)
    out_j = fg.apply({'params': params},
                     jnp.asarray(mel_c.numpy().transpose(0, 2, 1)),
                     jnp.asarray(mel_v.numpy().transpose(0, 2, 1)),
                     jnp.asarray(tmpl.numpy().transpose(0, 2, 1)),
                     jnp.asarray(tmpl.numpy().transpose(0, 2, 1)),
                     jnp.asarray(uv.numpy()[..., None]),
                     train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], tol=2e-4,
                  what=f'{ver} out')


@pytest.mark.parametrize('samples', [8192, 4000])
def test_discriminator_s_transplant(ref_disc, samples):
    _seed(samples)
    td = ref_disc.DiscriminatorS().eval()
    sd = td.state_dict()

    y_t = torch.rand(2, 1, samples) * 2 - 1
    with torch.no_grad():
        score_t, fmap_t = td(y_t)

    params = interop.transplant(sd, interop.map_disc_s())
    fd = D.DiscriminatorS()
    score_j, fmap_j = fd.apply({'params': params},
                               jnp.asarray(y_t.numpy().transpose(0, 2, 1)))
    _assert_close(score_j, score_t.numpy(), what='DiscS score')
    assert len(fmap_j) == len(fmap_t)
    for i, (fj, ft) in enumerate(zip(fmap_j, fmap_t)):
        _assert_close(np.transpose(fj, (0, 2, 1)), ft.numpy(),
                      what=f'DiscS fmap[{i}]')


@pytest.mark.parametrize('period,samples', [(3, 8192), (11, 5000)])
def test_discriminator_p_transplant(ref_disc, period, samples):
    _seed(period)
    td = ref_disc.DiscriminatorP(period).eval()
    sd = td.state_dict()

    y_t = torch.rand(2, 1, samples) * 2 - 1
    with torch.no_grad():
        score_t, fmap_t = td(y_t)

    params = interop.transplant(sd, interop.map_disc_p())
    fd = D.DiscriminatorP(period)
    score_j, fmap_j = fd.apply({'params': params},
                               jnp.asarray(y_t.numpy().transpose(0, 2, 1)))
    _assert_close(score_j, score_t.numpy(), what=f'DiscP{period} score')
    for i, (fj, ft) in enumerate(zip(fmap_j, fmap_t)):
        # flax NHWC [B, T', P, C] vs torch NCHW [B, C, T', P]
        _assert_close(np.transpose(fj, (0, 3, 1, 2)), ft.numpy(),
                      what=f'DiscP{period} fmap[{i}]')


def test_discriminator_stft_transplant(ref_disc):
    _seed(42)
    td = ref_disc.StftDiscriminator(0).eval()
    sd = td.state_dict()

    x_t = torch.randn(2, 2, 513, 69)   # [B, 2, F, T]
    with torch.no_grad():
        score_t, fmap_t = td(x_t)

    params = interop.transplant(sd, interop.map_disc_stft())
    fd = D.StftDiscriminator()
    # flax layout [B, F, T, 2]
    score_j, fmap_j = fd.apply({'params': params},
                               jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    _assert_close(score_j, score_t.numpy(), tol=2e-4, what='DiscStft score')
    for i, (fj, ft) in enumerate(zip(fmap_j, fmap_t)):
        _assert_close(np.transpose(fj, (0, 3, 1, 2)), ft.numpy(), tol=2e-4,
                      what=f'DiscStft fmap[{i}]')


def test_msd_mpd_mtd_full_transplant(ref_disc, cfg):
    """Full multi-discriminator stacks end-to-end (scores only)."""
    _seed(5)
    t_msd = ref_disc.MultiScaleDiscriminator().eval()
    t_mpd = ref_disc.MultiPeriodDiscriminator().eval()

    y = torch.rand(1, 1, 8192) * 2 - 1
    yh = torch.rand(1, 1, 8192) * 2 - 1
    with torch.no_grad():
        rs_t, gs_t, _, _ = t_msd(y, yh)
        rp_t, gp_t, _, _ = t_mpd(y, yh)

    yj = jnp.asarray(y.numpy().transpose(0, 2, 1))
    yhj = jnp.asarray(yh.numpy().transpose(0, 2, 1))

    p_msd = interop.transplant(t_msd.state_dict(), interop.map_msd())
    rs_j, gs_j, _, _ = D.MultiScaleDiscriminator(cfg).apply({'params': p_msd}, yj, yhj)
    for i in range(len(rs_t)):
        _assert_close(rs_j[i], rs_t[i].numpy(), what=f'MSD real[{i}]')
        _assert_close(gs_j[i], gs_t[i].numpy(), what=f'MSD fake[{i}]')

    p_mpd = interop.transplant(t_mpd.state_dict(), interop.map_mpd())
    rp_j, gp_j, _, _ = D.MultiPeriodDiscriminator(cfg).apply({'params': p_mpd}, yj, yhj)
    for i in range(len(rp_t)):
        _assert_close(rp_j[i], rp_t[i].numpy(), what=f'MPD real[{i}]')
        _assert_close(gp_j[i], gp_t[i].numpy(), what=f'MPD fake[{i}]')


def test_import_reference_ckpt_roundtrip(ref_gen, ref_disc, cfg, tmp_path):
    """End-to-end importer round trip: torch.save a reference-format
    ``g_<step>``/``do_<step>`` pair (``retunegan/train.py:214-224`` layout),
    convert with ``tools/import_reference_ckpt.import_run``, reload through
    the serving path (``restore_generator_params``), and assert the restored
    flax generator reproduces the torch generator's output."""
    from transtacos_retunegan_tpu.tools.import_reference_ckpt import import_run
    from transtacos_retunegan_tpu.train import checkpoint as ckpt

    _seed(99)
    tg = ref_gen.Generator_RefineGAN_small().eval()
    sd = _zero_noise(tg.state_dict())
    tg.load_state_dict(sd)
    g_src = tmp_path / 'g_00012345'
    torch.save({'generator': sd}, g_src)

    do_src = tmp_path / 'do_00012345'
    torch.save({
        'msd': ref_disc.MultiScaleDiscriminator().state_dict(),
        'mpd': ref_disc.MultiPeriodDiscriminator().state_dict(),
        'mtd': ref_disc.MultiStftDiscriminator().state_dict(),
        'steps': 12345, 'epoch': 7,
    }, do_src)

    out_dir = tmp_path / 'imported'
    g_out = import_run(str(g_src), str(out_dir), 'RefineGAN_small',
                       do_path=str(do_src), cfg=cfg)
    assert g_out.endswith('g_00012345')
    assert (out_dir / 'config.json').exists()
    assert (out_dir / 'do_00012345').exists()

    fg = G.GeneratorRefineGANSmall(cfg)
    hop = cfg.audio.hop_length
    mel_t = torch.randn(1, 80, 21)
    tmpl_t = torch.rand(1, 1, 21 * hop) * 2 - 1
    with torch.no_grad():
        out_t = tg(mel_t, tmpl_t).numpy()

    template = fg.init(jax.random.PRNGKey(0),
                       jnp.asarray(mel_t.numpy().transpose(0, 2, 1)),
                       jnp.asarray(tmpl_t.numpy().transpose(0, 2, 1)),
                       train=False)['params']
    params = ckpt.restore_generator_params(str(out_dir), template)
    assert params is not None
    out_j = fg.apply({'params': params},
                     jnp.asarray(mel_t.numpy().transpose(0, 2, 1)),
                     jnp.asarray(tmpl_t.numpy().transpose(0, 2, 1)),
                     train=False)
    _assert_close(out_j[..., 0], out_t[:, 0, :], what='imported ckpt out')


def test_multi_stft_loss_torch_oracle(cfg):
    """multi_stft_loss parity vs a torch oracle replicating the reference
    ``loss.py:22-62`` / ``audio.py:150-170`` math (torch.stft + the same
    slaney mel basis; librosa itself is absent from this image, but
    ``audio/mel.py`` is already pinned to librosa conventions by
    ``test_audio_dsp.py``)."""
    from transtacos_retunegan_tpu.audio.mel import mel_basis
    from transtacos_retunegan_tpu.models.vocoder_losses import (
        multi_stft_specs_and_loss)

    _seed(3)
    B, S = 2, 8192
    y = torch.rand(B, S) * 2 - 1
    yg = torch.rand(B, S) * 2 - 1

    loss_t = 0.0
    for n_fft, win, hop in cfg.vocoder.multi_stft_params:
        window = torch.hann_window(win)
        mb = torch.from_numpy(mel_basis(cfg.audio.sample_rate, n_fft,
                                        cfg.audio.n_mel, cfg.audio.fmin,
                                        cfg.audio.fmax).astype(np.float32))
        def _stft(w):
            d = torch.stft(w, n_fft, hop_length=hop, win_length=win,
                           window=window, center=True, pad_mode='reflect',
                           return_complex=True, normalized=False, onesided=True)
            s = torch.abs(d + 1e-9)
            return s, torch.matmul(mb, s)
        _, m_r = _stft(y)
        _, m_g = _stft(yg)
        loss_t = loss_t + torch.nn.functional.l1_loss(m_r, m_g)
        loss_t = loss_t + torch.nn.functional.l1_loss(torch.log(m_r), torch.log(m_g))
    loss_t = (loss_t / len(cfg.vocoder.multi_stft_params)).item()

    loss_j, _, _ = multi_stft_specs_and_loss(jnp.asarray(y.numpy()),
                                             jnp.asarray(yg.numpy()), cfg)
    assert abs(float(loss_j) - loss_t) <= 5e-4 * max(1.0, abs(loss_t)), (
        f'mstft loss: jax {float(loss_j):.6f} vs torch {loss_t:.6f}')

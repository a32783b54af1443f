"""openSMILE conf dialect parser tests (against the real Androids.conf)."""

import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.features.conf_parser import (
    opensmile_config_from_conf,
    parse_conf,
)

SAMPLE = """
;;; comment
[waveIn:cWaveSource]
writer.dmLevel=wave
filename=\\cm[inputfile(I){test.wav}:name of input file]
sampleRate = 44100
monoMixdown=1

[fr1:cFramer]
reader.dmLevel=wave
frameSize=0.0250
frameStep = 0.010

// another comment
[pe2:cVectorPreemphasis]
k=0.97

[mspec:cMelspec]
htkcompatible = 1
lofreq = 20
hifreq = 8000

[shs:cPitchShs]
maxPitch = 620
minPitch = 52
nCandidates = 6
compressionFactor = 0.850000

[pitchSmooth:cPitchSmootherViterbi]
wTvv =10.0
wThr = 4.0

[volmerge:cValbasedSelector]
threshold=0.001

[pitchJitter:cPitchJitter]
searchRangeRel = 0.250000
"""


def test_parse_sections_and_values():
    s = parse_conf(SAMPLE)
    assert "waveIn:cWaveSource" in s
    assert s["waveIn:cWaveSource"]["sampleRate"] == "44100"
    assert s["waveIn:cWaveSource"]["filename"] == "test.wav"  # \cm default
    assert s["fr1:cFramer"]["frameSize"] == "0.0250"
    assert s["pe2:cVectorPreemphasis"]["k"] == "0.97"


def test_config_mapping():
    cfg = opensmile_config_from_conf(SAMPLE)
    # cWaveSource.sampleRate (44100) must NOT leak into frame geometry:
    # the pipeline feeds 16 kHz audio and openSMILE takes the rate from
    # the WAV header, not the conf
    assert cfg.frontend.sample_rate == 16000
    assert cfg.frontend.frame_seconds == 0.025
    assert cfg.frontend.preemphasis == 0.97
    assert cfg.shs.max_pitch == 620
    assert cfg.shs.min_pitch == 52
    assert cfg.shs.compression == pytest.approx(0.85)
    assert cfg.energy_gate == pytest.approx(0.001)
    assert cfg.jitter_search_range == pytest.approx(0.25)


def test_real_androids_conf():
    with open("/root/reference/Androids.conf") as fh:
        text = fh.read()
    cfg = opensmile_config_from_conf(text)
    assert cfg.frontend.frame_seconds == pytest.approx(0.025)
    assert cfg.frontend.hop_seconds == pytest.approx(0.010)
    assert cfg.frontend.preemphasis == pytest.approx(0.97)
    assert cfg.frontend.fmin == 20 and cfg.frontend.fmax == 8000
    assert cfg.n_mfcc == 12
    assert cfg.shs.n_harmonics == 15
    assert cfg.shs.voicing_cutoff == pytest.approx(0.70)
    assert cfg.shs.w_tvv == 10.0 and cfg.shs.w_thr == 4.0
    assert cfg.energy_gate == pytest.approx(0.001)

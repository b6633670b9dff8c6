"""Config schema tests: JSON round trip, reference field names, errors."""

from __future__ import annotations

import json

import pytest

from xmtpu.config.schema import (
    EffectConfig,
    PipelineConfig,
    TrackConfig,
    config_from_dict,
    config_to_dict,
    dump_config,
    load_config,
)


def _full_cfg() -> PipelineConfig:
    return PipelineConfig(
        tracks=(
            TrackConfig(url="v.wav", kind="voice", volume=0.9,
                        start_time_ms=100.0, end_time_ms=5000.0,
                        fade_in_ms=50.0, fade_out_ms=100.0),
            TrackConfig(url="b.mp3", kind="bgm", volume=0.4, loop=True,
                        side_duck=True),
        ),
        effects=(EffectConfig("noise_suppression", {}),),
        master_effects=(
            EffectConfig("equalizer", {"bands": [
                {"freq_hz": 1000.0, "gain_db": 3.0, "q": 1.0}]}),
            EffectConfig("limiter", {"threshold_db": -3.0}),
        ),
        sample_rate=16000,
        normalize="loudness",
        normalize_target_db=-16.0,
        block_size=32768,
    )


def test_json_round_trip():
    cfg = _full_cfg()
    cfg2 = config_from_dict(config_to_dict(cfg))
    assert cfg2 == cfg


def test_dump_and_load_file(tmp_path):
    cfg = _full_cfg()
    p = tmp_path / "cfg.json"
    dump_config(cfg, p)
    assert load_config(p) == cfg
    # also from a JSON string (the reference passes config as a string)
    assert load_config(dump_config(cfg)) == cfg


def test_reference_field_names():
    """The JSON vocabulary matches the reference's mixer-config fields."""
    d = config_to_dict(_full_cfg())
    t = d["tracks"][0]
    for key in ("url", "volume", "startTimeMs", "endTimeMs",
                "fadeInTimeMs", "fadeOutTimeMs", "loop", "sideDuck"):
        assert key in t, key
    assert "sampleRate" in d and "masterEffects" in d


def test_defaults_and_partial_json():
    cfg = config_from_dict(json.loads('{"tracks": [{"url": "a.wav"}]}'))
    assert cfg.sample_rate == 16000
    assert cfg.normalize == "peak"
    assert cfg.tracks[0].volume == 1.0
    assert not cfg.tracks[0].loop


def test_negative_volume_rejected():
    with pytest.raises(ValueError):
        TrackConfig(url="x.wav", volume=-0.1)


def test_config_malformed_entries_raise_config_error():
    from xmtpu.config.schema import config_from_dict
    from xmtpu.utils.errors import ConfigError

    with pytest.raises(ConfigError):
        config_from_dict({"effects": [{"params": {}}]})
    with pytest.raises(ConfigError):
        config_from_dict({"tracks": ["not-an-object"]})


def test_config_flat_effect_form():
    from xmtpu.config.schema import config_from_dict

    cfg = config_from_dict(
        {"effects": [{"name": "limiter", "threshold_db": -3.0}]})
    assert cfg.effects[0].params == {"threshold_db": -3.0}


def test_malformed_configs_raise_config_error(tmp_path):
    """Fuzz find: malformed configs leaked bare float() ValueErrors,
    FileNotFoundError for non-object JSON strings, and accepted values
    every downstream consumer rejects (sampleRate 0, unknown normalize
    mode). All must surface as ConfigError at parse time."""
    from xmtpu.config.schema import load_config
    from xmtpu.utils.errors import ConfigError

    bad = [
        "[]", '"str"', "42", "null", "not json at all",
        '{"tracks": "notalist"}',
        '{"tracks": [{"url": 5}]}',
        '{"tracks": [{"url": "a.wav", "volume": "loud"}]}',
        '{"tracks": [{"url": "a.wav", "fadeInTimeMs": "x"}]}',
        '{"tracks": [{"url": "a.wav", "volume": -2}]}',
        '{"tracks": [{"url": "a.wav"}], "sampleRate": 0}',
        '{"tracks": [{"url": "a.wav"}], "channels": 0}',
        '{"tracks": [{"url": "a.wav"}], "normalize": "sparkle"}',
    ]
    for c in bad:
        with pytest.raises(ConfigError):
            load_config(c)
    # unknown effect NAMES stay late-validated (custom effects register
    # at build_chain time), and the legacy "loudness" alias still parses
    cfg = load_config('{"tracks": [{"url": "a.wav"}], '
                      '"normalize": "loudness", '
                      '"effects": [{"name": "custom_fx"}]}')
    assert cfg.normalize == "loudness"


def test_validation_review_gaps():
    """Second review pass over the validation sweep: truncated JSON
    literals and files raise ConfigError (not JSONDecodeError); typo'd
    or mis-cased track keys/kinds are rejected (a 'Voice' kind used to
    silently route the track to the BGM bus)."""
    from xmtpu.config.schema import load_config
    from xmtpu.utils.errors import ConfigError

    with pytest.raises(ConfigError, match="JSON"):
        load_config('{"tracks": ')
    import tempfile, os
    fd, p = tempfile.mkstemp(suffix=".json")
    os.write(fd, b"{ definitely not json")
    os.close(fd)
    try:
        with pytest.raises(ConfigError, match="JSON"):
            load_config(p)
    finally:
        os.unlink(p)
    with pytest.raises(ConfigError, match="unknown key"):
        load_config('{"tracks": [{"url": "a.wav", "volumee": 0.5}]}')
    with pytest.raises(ConfigError, match="kind"):
        load_config('{"tracks": [{"url": "a.wav", "kind": "Voice"}]}')


def test_top_level_keys_alongside_params_rejected():
    """A key sitting NEXT to an explicit 'params' dict (e.g. a
    top-level 'backend', or a typo) used to be silently dropped,
    bypassing the unknown-parameter gate — and an invalid entry must
    not alias a previously-cached valid chain (review find)."""
    import numpy as np

    from xmtpu.graph import fx
    from xmtpu.utils.errors import ConfigError

    good = [{"name": "volume", "params": {"gain_db": -3.0}}]
    bad = [{"name": "volume", "params": {"gain_db": -3.0},
            "backend": "scan"}]
    with pytest.raises(ConfigError, match="alongside 'params'"):
        fx.build_chain(16000, bad)
    # prime the compiled-chain cache with the valid twin, then make
    # sure the invalid entry still raises instead of hitting the cache
    x = np.zeros(1600, np.float32)
    import xmtpu

    xmtpu.effects(x, 16000, good)
    with pytest.raises(ConfigError, match="alongside 'params'"):
        xmtpu.effects(x, 16000, bad)


def test_reverb_ir_array_validated_at_build():
    """A 2-D or NaN-poisoned explicit IR must be rejected at session
    build, not crash (or silently NaN the output) at the first
    apply() (review find)."""
    import numpy as np

    from xmtpu.graph import fx
    from xmtpu.utils.errors import ConfigError

    with pytest.raises(ConfigError, match="1-D"):
        fx.build_chain(16000, [{"name": "reverb",
                                "ir": np.ones((8, 2), np.float32)}])
    with pytest.raises(ConfigError, match="NaN"):
        fx.build_chain(16000, [{"name": "reverb",
                                "ir": [0.5, float("nan")]}])
    with pytest.raises(ConfigError, match="non-numeric"):
        fx.build_chain(16000, [{"name": "reverb", "ir": ["a", "b"]}])


def test_schema_review_gaps_round3():
    """NaN volume, stringified booleans, unknown top-level keys and
    keys alongside 'params' are rejected at parse time (review
    finds)."""
    from xmtpu.utils.errors import ConfigError

    with pytest.raises(ConfigError, match="finite"):
        config_from_dict(
            {"tracks": [{"url": "a.wav", "volume": float("nan")}]})
    with pytest.raises(ConfigError, match="boolean"):
        config_from_dict(
            {"tracks": [{"url": "a.wav", "loop": "false"}]})
    with pytest.raises(ConfigError, match="unknown key"):
        config_from_dict({"masterEffect": []})
    with pytest.raises(ConfigError, match="alongside 'params'"):
        config_from_dict({"effects": [
            {"name": "volume", "params": {"gain_db": -3.0},
             "backend": "scan"}]})
    # 0/1 stay accepted as booleans (lenient numeric form)
    cfg = config_from_dict({"tracks": [{"url": "a.wav", "loop": 1}]})
    assert cfg.tracks[0].loop is True


def test_config_fuzz_only_typed_errors():
    """Property: config_from_dict on randomly mutated configs either
    succeeds or raises ConfigError — never TypeError/KeyError/
    ZeroDivisionError/AttributeError (the round-3 strictness sweep
    should have closed every untyped escape)."""
    import numpy as np

    from xmtpu.utils.errors import ConfigError

    base = {
        "tracks": [{"url": "v.wav", "kind": "voice", "volume": 0.9,
                    "startTimeMs": 100.0, "loop": False}],
        "effects": [{"name": "equalizer", "params": {"bands": [
            {"freq_hz": 1000.0, "gain_db": 3.0, "q": 1.0}]}}],
        "sampleRate": 16000, "normalize": "peak",
        "normalizeTargetDb": -1.0,
    }
    junk = [None, "x", -1, 0, 3.5, float("nan"), float("inf"), [], {},
            "false", True, [1, 2], {"a": 1}, "NaN", -1e300, 2**63]
    rng = np.random.default_rng(20260818)
    ok = bad = 0
    for _ in range(400):
        import copy as _copy
        import json as _json

        d = _copy.deepcopy(base)
        # mutate 1-3 random spots: replace a value, add a key, or
        # corrupt a nested entry
        for _ in range(int(rng.integers(1, 4))):
            roll = rng.integers(0, 6)
            j = junk[int(rng.integers(0, len(junk)))]
            if roll == 0:
                k = list(d)[int(rng.integers(0, len(d)))]
                d[k] = j
            elif roll == 1:
                d[f"key{int(rng.integers(0, 5))}"] = j
            elif roll == 2 and isinstance(d.get("tracks"), list) and d["tracks"]:
                t = d["tracks"][0]
                if isinstance(t, dict) and t:
                    k = list(t)[int(rng.integers(0, len(t)))]
                    t[k] = j
            elif roll == 3 and isinstance(d.get("effects"), list) and d["effects"]:
                e = d["effects"][0]
                if isinstance(e, dict) and e:
                    k = list(e)[int(rng.integers(0, len(e)))]
                    e[k] = j
            elif roll == 4:
                d["tracks"] = j
            else:
                d["effects"] = j
        try:
            cfg = config_from_dict(d)
            _json.dumps(config_to_dict(cfg))  # round-trippable when accepted
            ok += 1
        except ConfigError:
            bad += 1
        # anything else (TypeError, KeyError, ...) fails the test
    assert ok + bad == 400 and bad > 100, (ok, bad)

"""Persistent compilation cache helper (utils/compile_cache.py)."""
import jax

from visual_onoma_to_wave_tpu.utils.compile_cache import enable_persistent_cache


def test_respects_existing_configuration():
    # conftest.py already configured a dir for the test session: the
    # library must NOT override an embedding application's choice
    before = jax.config.jax_compilation_cache_dir
    assert before is not None
    assert enable_persistent_cache() == before
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_dir_and_opt_out(tmp_path, monkeypatch):
    before = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_cache(cache_dir=tmp_path / "cache")
        assert d == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == d

        monkeypatch.setenv("VOW_NO_COMPILE_CACHE", "1")
        assert enable_persistent_cache(cache_dir=tmp_path / "x") is None
        # opted out -> configuration untouched
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", before)

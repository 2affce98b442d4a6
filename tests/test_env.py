def test_backend():
    import jax
    print("BACKEND:", jax.default_backend(), "ndev:", jax.device_count())
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8

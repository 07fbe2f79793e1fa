import jax


def test_backend_is_cpu():
    assert jax.default_backend() == "cpu", jax.devices()
    assert len(jax.devices()) == 8

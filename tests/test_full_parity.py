"""Full-forward numeric parity: torch replica -> converter -> flax model.

The strongest offline parity check available without the published weights:
a random-weight torch model with the reference's exact architecture and
checkpoint key layout must produce the same bon/cor as the flax model fed
through models.torch_convert. Covers conv/BN/maxpool/height-resize/LSTM/
head wiring end to end.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.torch_replica import TorchHorizonNetReplica, small_init_  # noqa: E402
from horizonnet_tpu.models import build_model  # noqa: E402
from horizonnet_tpu.models.torch_convert import torch_state_to_variables  # noqa: E402


@pytest.mark.slow
@pytest.mark.parametrize("backbone,use_rnn", [
    ("resnet50", True),      # the flagship published architecture
    ("densenet121", True),   # the torchvision-quirk encoder family
    ("resnet50", False),     # the no-RNN head (model.py:235-243)
])
def test_full_forward_parity(backbone, use_rnn):
    torch.manual_seed(0)
    replica = small_init_(TorchHorizonNetReplica(backbone, use_rnn)).eval()
    x = np.random.default_rng(0).uniform(0, 1, (1, 512, 1024, 3)) \
        .astype(np.float32)

    with torch.no_grad():
        bon_t, cor_t = replica(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    sd = {k: v.detach().numpy() for k, v in replica.state_dict().items()}
    variables = torch_state_to_variables(sd, backbone, use_rnn=use_rnn)
    model = build_model(backbone, use_rnn=use_rnn)
    bon_j, cor_j = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(bon_j), bon_t.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cor_j), cor_t.numpy(),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_reference_pth_file_loads_end_to_end(tmp_path):
    """A real torch-saved checkpoint in the reference's save_model format
    ({args, kwargs, state_dict}, misc/utils.py:49-58) loads through
    train.checkpoint.load_trained_model and runs."""
    from horizonnet_tpu.train.checkpoint import load_trained_model

    torch.manual_seed(1)
    replica = small_init_(TorchHorizonNetReplica()).eval()
    path = str(tmp_path / "ref_style.pth")
    torch.save({
        "args": {"id": "test"},
        "kwargs": {"backbone": "resnet50", "use_rnn": True},
        "state_dict": replica.state_dict(),
    }, path)

    model, variables = load_trained_model(path)
    assert model.backbone == "resnet50" and model.use_rnn
    x = np.random.default_rng(1).uniform(0, 1, (1, 512, 128, 3)) \
        .astype(np.float32)
    bon, cor = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        bon_t, _ = replica(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(bon), bon_t.numpy(),
                               rtol=1e-3, atol=2e-4)

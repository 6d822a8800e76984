"""Hand-reconstructed torch oracles of the reference descriptor networks.

Each oracle rebuilds a reference architecture (from reading its source — cited
per module) in plain torch with the SAME state_dict key layout as the shipped
checkpoints, so `tests/test_torch_parity.py` can pin every JAX converter +
forward pass against a seeded torch run: torch(seeded weights) -> state_dict ->
vfmreg converter -> JAX forward == torch forward.

These run in eval mode with RANDOMIZED BatchNorm running statistics (so a
mean/var mix-up cannot cancel out).
"""


def randomize_module(module, seed):
    """Fill every parameter AND buffer (BN running stats) with seeded noise."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.dim() >= 2:
                # Keep activations O(1) through deep stacks so float32 parity
                # tolerances stay meaningful (no exponential amplification).
                fan_in = p.shape[1:].numel()
                p.copy_(torch.randn(p.shape, generator=g) / fan_in**0.5)
            elif name.endswith("weight"):  # BN gamma: around 1
                p.copy_(1.0 + torch.randn(p.shape, generator=g) * 0.2)
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in module.named_buffers():
            if b.dtype.is_floating_point:
                if "running_var" in name:
                    b.copy_(torch.rand(b.shape, generator=g) * 1.5 + 0.25)
                else:
                    b.copy_(torch.randn(b.shape, generator=g) * 0.2)
    module.eval()
    return module

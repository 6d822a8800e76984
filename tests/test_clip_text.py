"""CLIP text tower: tokenizer semantics + parity vs transformers CLIPText.

Pins the prompt-string path of `compute_similarity`
(reference `vfm_reg/image_features.py:194-208`): CLIP BPE tokenize ->
encode_text -> cosine similarity against per-point features.
"""

import numpy as np
import pytest

from vfmreg_tpu.models.clip_text import (
    CLIPTextConfig,
    SimpleTokenizer,
    bytes_to_unicode,
    clip_text_forward,
    load_clip_text_state_dict,
)


def _tiny_tokenizer():
    # Merge table: "l o" -> "lo", "lo w</w>" -> "low</w>", "h e" -> "he"
    merges = ["l o", "lo w</w>", "h e"]
    return SimpleTokenizer(merges=merges), merges


def test_tokenizer_bpe_merges_and_special_tokens():
    tok, merges = _tiny_tokenizer()
    n_base = 2 * len(bytes_to_unicode())
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert sot == n_base + len(merges) and eot == sot + 1

    # "low" fully merges into the single token "low</w>".
    ids = tok.encode("low")
    assert ids == [tok.encoder["low</w>"]]
    # "he" merges "h e" but has no "he</w>" merge -> "he" + "</w>"-suffixed 'e'?
    # BPE on "he": word = ('h', 'e</w>'); pair ('h', 'e</w>') is not in the
    # table (the merge is ('h', 'e')), so it stays two tokens.
    assert len(tok.encode("he")) == 2

    arr = tok.tokenize("low", context_length=8)
    assert arr.shape == (1, 8)
    assert arr[0, 0] == sot and arr[0, 2] == eot and arr[0, 3:].sum() == 0
    # Case folding + whitespace normalization.
    assert tok.encode("  LOW  ") == tok.encode("low")


def test_tokenizer_truncation_keeps_eot():
    tok, _ = _tiny_tokenizer()
    arr = tok.tokenize("low low low low low low", context_length=4)
    assert arr[0, 0] == tok.encoder["<|startoftext|>"]
    assert arr[0, -1] == tok.encoder["<|endoftext|>"]


def test_text_tower_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    vocab, width, layers, heads, embed = 64, 32, 2, 4, 16
    hf_cfg = HFConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=4 * width,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=12, hidden_act="quick_gelu",
        projection_dim=embed, eos_token_id=vocab - 1, bos_token_id=vocab - 2,
    )
    torch.manual_seed(3)
    net = CLIPTextModelWithProjection(hf_cfg).eval()

    # HF naming -> OpenAI CLIP state-dict naming.
    hf = {k: v for k, v in net.state_dict().items()}
    sd = {
        "token_embedding.weight": hf["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": hf["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf["text_model.final_layer_norm.bias"],
        "text_projection": hf["text_projection.weight"].T,
    }
    for i in range(layers):
        src = f"text_model.encoder.layers.{i}"
        dst = f"transformer.resblocks.{i}"
        sd[f"{dst}.attn.in_proj_weight"] = torch.cat(
            [hf[f"{src}.self_attn.{p}_proj.weight"] for p in "qkv"], dim=0
        )
        sd[f"{dst}.attn.in_proj_bias"] = torch.cat(
            [hf[f"{src}.self_attn.{p}_proj.bias"] for p in "qkv"], dim=0
        )
        sd[f"{dst}.attn.out_proj.weight"] = hf[f"{src}.self_attn.out_proj.weight"]
        sd[f"{dst}.attn.out_proj.bias"] = hf[f"{src}.self_attn.out_proj.bias"]
        sd[f"{dst}.ln_1.weight"] = hf[f"{src}.layer_norm1.weight"]
        sd[f"{dst}.ln_1.bias"] = hf[f"{src}.layer_norm1.bias"]
        sd[f"{dst}.ln_2.weight"] = hf[f"{src}.layer_norm2.weight"]
        sd[f"{dst}.ln_2.bias"] = hf[f"{src}.layer_norm2.bias"]
        sd[f"{dst}.mlp.c_fc.weight"] = hf[f"{src}.mlp.fc1.weight"]
        sd[f"{dst}.mlp.c_fc.bias"] = hf[f"{src}.mlp.fc1.bias"]
        sd[f"{dst}.mlp.c_proj.weight"] = hf[f"{src}.mlp.fc2.weight"]
        sd[f"{dst}.mlp.c_proj.bias"] = hf[f"{src}.mlp.fc2.bias"]

    cfg = CLIPTextConfig(
        vocab_size=vocab, width=width, num_layers=layers, num_heads=heads,
        embed_dim=embed, context_length=12,
    )
    params = load_clip_text_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)

    # Tokens: BOS ... EOS then zero padding; EOS has the max id so the OpenAI
    # argmax pooling and HF's eos pooling pick the same position.
    rng = np.random.RandomState(0)
    tokens = np.zeros((3, 12), dtype=np.int32)
    for b in range(3):
        n = 4 + b
        tokens[b, 0] = vocab - 2
        tokens[b, 1 : 1 + n] = rng.randint(1, vocab - 2, n)
        tokens[b, 1 + n] = vocab - 1

    with torch.no_grad():
        want = net(input_ids=torch.from_numpy(tokens.astype(np.int64))).text_embeds.numpy()
    got = np.asarray(clip_text_forward(params, tokens, cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_compute_similarity_with_prompt():
    import jax

    from vfmreg_tpu.models.clip_text import init_clip_text_params
    from vfmreg_tpu.models.image_features import ImageFeatureGenerator

    cfg = CLIPTextConfig(vocab_size=64 + 2 * len(bytes_to_unicode()) + 3,
                         width=16, num_layers=1, num_heads=2, embed_dim=8,
                         context_length=8)
    tok, _ = _tiny_tokenizer()
    gen = ImageFeatureGenerator("maskclip")
    gen.set_text_encoder(init_clip_text_params(jax.random.PRNGKey(0), cfg), cfg, tok)

    feats = np.random.RandomState(1).randn(5, 8).astype(np.float32)
    feats[2] = 0.0
    sims = gen.compute_similarity(feats, "low")
    assert sims.shape == (5,)
    assert sims[2] == 0.0
    emb = gen.encode_text("low")
    np.testing.assert_allclose(sims, gen.compute_similarity(feats, emb))


def test_vendored_bpe_vocab_canonical_ids():
    """The vendored merge table (data/clip/bpe_simple_vocab_16e6.txt.gz — the
    reference ships the same artifact at src/featup_data/) reproduces OpenAI
    CLIP's canonical token ids for the standard probe prompt."""
    from vfmreg_tpu.models.clip_text import DEFAULT_BPE_PATH

    assert DEFAULT_BPE_PATH.exists()
    tok = SimpleTokenizer()  # defaults to the vendored table
    ids = tok.tokenize(["a photo of a cat"])
    assert ids.shape == (1, 77)
    row = [int(x) for x in ids[0] if x != 0]
    assert row == [49406, 320, 1125, 539, 320, 2368, 49407]

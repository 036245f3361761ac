"""CLIP text encoder parity vs transformers' CLIPTextModel (random weights),
and BPE tokenizer parity vs transformers' CLIPTokenizer on a toy vocab."""

import json

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from sdmatte_tpu.configs import CLIPTextConfig
from sdmatte_tpu.models import clip as jclip
from sdmatte_tpu.models.tokenizer import CLIPTokenizer as OurTokenizer
from sdmatte_tpu.checkpoint import loader


@pytest.fixture(scope="module")
def hf_model():
    import transformers
    cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=77, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(cfg).eval()
    return model


def test_clip_matches_transformers(hf_model):
    cfg = CLIPTextConfig.tiny()
    params = jclip.init(cfg, seed=0)
    sd = {("text_encoder." + k): v.detach().numpy()
          for k, v in hf_model.state_dict().items()}
    params = {"text_encoder": params}
    params, report = loader.load_into_tree(params, sd)
    # transformers may carry extra buffers (position_ids); params all load
    assert not report.missing, report.missing

    ids = np.array([[49406 % 1000, 5, 9, 49407 % 1000] + [0] * 73,
                    [1, 2, 3, 4, 5, 6, 7, 8] + [0] * 69], dtype=np.int32)
    ours = jclip.apply(params["text_encoder"], jnp.asarray(ids), cfg)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64)))[0].numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------- tokenizer ---

@pytest.fixture(scope="module")
def toy_vocab(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    words = ["hello", "world", "cat", "dog", "a", "the", "mat", "ting", "41"]
    chars = sorted(set("".join(words)) | set("abcdefghijklmnopqrstuvwxyz0123456789!',."))
    vocab = {}
    for ch in chars:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    merges = ["#version: 0.2"]
    for w in ["hello", "world", "cat", "dog", "mat", "ting"]:
        # build left-to-right merges for each word ending with </w>
        for i in range(1, len(w)):
            pair = (w[:i], w[i] + ("</w>" if i == len(w) - 1 else ""))
            merged = pair[0] + pair[1]
            if merged not in vocab:
                vocab[merged] = len(vocab)
            m = f"{pair[0]} {pair[1]}"
            if m not in merges:
                merges.append(m)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.mark.parametrize("text", [
    "",
    "hello world",
    "a cat, the dog!",
    "matting  with   spaces",
    "HELLO World",
    "cat41dog",
    "cat,,.world",        # punctuation runs stay one token (HF \p-class runs)
    "a_cat",              # underscore is punctuation for CLIP, not \w
    "it's the cat's",     # contraction suffixes
])
def test_tokenizer_matches_transformers(toy_vocab, text):
    from transformers import CLIPTokenizer as HFTok
    vocab_file, merges_file = toy_vocab
    hf = HFTok(vocab_file, merges_file, pad_token="!")
    ours = OurTokenizer(vocab_file, merges_file, pad_token="!")
    got = ours([text])[0]
    ref = hf([text], padding="max_length", max_length=77, truncation=True)["input_ids"][0]
    assert got == ref, (got[:12], ref[:12])


def test_tokenizer_truncation(toy_vocab):
    vocab_file, merges_file = toy_vocab
    ours = OurTokenizer(vocab_file, merges_file, pad_token="!")
    ids = ours("hello " * 200)[0]
    assert len(ids) == 77
    assert ids[0] == ours.bos_token_id and ids[-1] == ours.eos_token_id

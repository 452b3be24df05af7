"""Local HF fast-tokenizer fixtures with the REAL model special-token ids.

No network: tiny char-level BPE vocabs with the production special tokens
pinned at their real ids (Qwen2-VL: 151643-151656; Llama: bos=1/eos=2), so
prompt-building paths run against genuine `transformers` tokenizers instead
of the ByteTokenizer stub.
"""
from tokenizers import AddedToken, Tokenizer, decoders, models, processors

QWEN_SPECIALS = {
    "<|endoftext|>": 151643,
    "<|im_start|>": 151644,
    "<|im_end|>": 151645,
    "<|vision_start|>": 151652,
    "<|vision_end|>": 151653,
    "<|image_pad|>": 151655,
    "<|video_pad|>": 151656,
}


def make_hf_qwen_tokenizer():
    """Char-level fast tokenizer with Qwen2-VL's special-token ids."""
    from transformers import PreTrainedTokenizerFast
    vocab = {chr(i): i for i in range(32, 127)}
    vocab["\n"] = 10
    vocab.update(QWEN_SPECIALS)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None))
    tok.decoder = decoders.Fuse()
    hf = PreTrainedTokenizerFast(tokenizer_object=tok,
                                 eos_token="<|im_end|>",
                                 pad_token="<|endoftext|>")
    hf.add_special_tokens({"additional_special_tokens": [
        AddedToken(s, special=True) for s in QWEN_SPECIALS]})
    return hf


def make_hf_llama_tokenizer():
    """Char-level fast tokenizer with Llama's bos=1/eos=2/unk=0 and a
    post-processor that prepends BOS (exercises the bos-offset logic in
    preprocess/tokenizer.py:35-39)."""
    from transformers import PreTrainedTokenizerFast
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    vocab.update({chr(i): i + 3 for i in range(32, 127)})
    vocab["\n"] = 130
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.decoder = decoders.Fuse()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", 1)])
    hf = PreTrainedTokenizerFast(tokenizer_object=tok, bos_token="<s>",
                                 eos_token="</s>", unk_token="<unk>",
                                 pad_token="<unk>")
    return hf

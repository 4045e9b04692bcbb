"""HFTokenizer adapter test with a locally-built fast tokenizer (no
network): validates the production tokenizer path used when a saved
xlm-roberta tokenizer directory is available."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from kbner_tpu.data import HFTokenizer, encode_batch  # noqa: E402
from kbner_tpu.data.conll import SentenceRecord  # noqa: E402
from kbner_tpu.data.subword import subtoken_length  # noqa: E402


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = tmp_path_factory.mktemp("hf_tok")
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    tok.train_from_iterator(
        ["alice visited berlin yesterday",
         "acme corp is a company in new york",
         "the european union met in paris"], trainer)
    tok.save(str(d / "tokenizer.json"))
    json.dump({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "pad_token": "<pad>", "cls_token": "<s>", "sep_token": "</s>",
    }, open(d / "tokenizer_config.json", "w"))
    return d


def test_hf_tokenizer_adapter(tok_dir):
    tok = HFTokenizer(str(tok_dir))
    assert tok.cls_id == 0 and tok.sep_id == 2 and tok.pad_id == 1
    ids = tok.encode_word("berlin")
    assert len(ids) >= 1 and all(isinstance(i, int) for i in ids)
    # cache returns identical results
    assert tok.encode_word("berlin") == ids
    # unknown garbage still yields at least one id
    assert len(tok.encode_word("zzzqqqxxx")) >= 1


def test_hf_tokenizer_through_encode_batch(tok_dir):
    tok = HFTokenizer(str(tok_dir))
    recs = [SentenceRecord(tokens=["alice", "visited", "berlin"],
                           tags={"ner": ["S-PER", "O", "S-LOC"]})]
    eb = encode_batch(recs, tok, None)
    assert eb.input_ids[0, 0] == tok.cls_id
    # word starts point at real subtokens
    n = subtoken_length(tok, recs[0].tokens)
    assert eb.attention_mask[0].sum() == n + 2  # + CLS/SEP
    assert (eb.word_starts[0, :3] > 0).all()

"""Drop-in scalar API with the reference's names and semantics.

Users of COMBINE-lab/kmers can port call sites one-to-one:

    from kmers_tpu.compat import Kmer, CanonicalKmer, CanonicalKmerIterator

    km = Kmer.from_str("ACGTT")
    ck = CanonicalKmer.from_kmer(km)
    ck.append_base_u8(ord("G"))

These are the oracle classes (kmers_tpu.oracle.numpy_ref) -- the normative
scalar model every batched op is fuzzed against -- so compat results are
bit-identical to the device pipelines.  For throughput, migrate hot loops
to the batched ops (kmers_tpu.ops / kmers_tpu.parallel); this module is the
porting on-ramp and the semantics reference.
"""

from .oracle.numpy_ref import (
    MASK64,
    MASK_TABLE,
    CanonicalKmer,
    CanonicalKmerIterator,
    HashState,
    Kmer,
    MatchType,
    Orientation,
    SeqVector,
    SeqVectorSlice,
    complement_base,
    encode_binary,
    encode_binary_u8,
    hash_one,
    is_valid_nuc,
    lex_hash,
    lex_hash_state,
    mix_hash,
    mix_hash_state,
    minimizer_word,
    reverse_complement_word,
    sub_kmer_word,
    word_from_bytes,
    word_to_string,
)

__all__ = [
    "MASK64", "MASK_TABLE", "CanonicalKmer", "CanonicalKmerIterator",
    "HashState", "Kmer", "MatchType", "Orientation", "SeqVector",
    "SeqVectorSlice", "complement_base", "encode_binary", "encode_binary_u8",
    "hash_one", "is_valid_nuc", "lex_hash", "lex_hash_state", "mix_hash",
    "mix_hash_state", "minimizer_word", "reverse_complement_word",
    "sub_kmer_word", "word_from_bytes", "word_to_string",
]

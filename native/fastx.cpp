// fastx.cpp -- native FASTA/FASTQ batch reader for kmers_tpu.
//
// The reference (COMBINE-lab/kmers) is a native Rust library with no I/O
// layer; kmers_tpu's ingest path is new scope and, like the reference's
// compute structs, lives in native code: this parser feeds fixed-shape
// [B, L] uint8 batches straight into host buffers for device upload,
// without Python string handling on the hot path.
//
// Exposed via a C ABI for ctypes (no pybind11 in the build environment).
//
// Format handling:
//   * FASTA: '>' headers, multi-line sequences concatenated.
//   * FASTQ: '@' header, sequence (possibly multi-line), '+' separator,
//     quality (len(seq) bytes; quality lines may start with '@', handled by
//     length tracking).
//   * CRLF tolerated; arbitrary line lengths (1 MiB buffered reader).
//   * gzip-compressed input (.fastq.gz etc.) handled transparently via
//     zlib's gzFile layer -- gzread passes plain files through unchanged,
//     so one code path serves both.
//
// Two batch modes:
//   * fastx_next_batch: one record per row; records longer than L are
//     copied truncated with the TRUE length reported in lengths[].
//   * fastx_next_batch_chunked: records longer than L are split into
//     multiple rows with an `overlap`-base halo (overlap = k-1), streamed
//     across batch boundaries, so every k-window of the original record
//     appears in exactly one row.  This is the counting-pipeline ingest
//     path (SURVEY.md §5.7 halo rule, §7 "ragged reads").

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>

#include <zlib.h>

namespace {

constexpr size_t kBufSize = 1 << 20;
constexpr long kMaxOverlap = 4096;

struct Reader {
    gzFile f = nullptr;  // zlib: plain files pass through, .gz inflates
    unsigned char buf[kBufSize];
    size_t pos = 0, len = 0;
    bool eof = false;
    int format = 0;  // 1 = fasta, 2 = fastq
    bool error = false;
    long long records = 0;

    // chunked-mode state: mid-record carry
    bool in_record = false;        // sequence of current record not finished
    unsigned char carry[kMaxOverlap];
    long carry_len = 0;
    long long seq_total = 0;       // bases of current record seen so far

    // scratch ASCII row for the packed batch path (parse into here, then
    // 2-bit pack into the caller's word/bitmap buffers)
    std::vector<unsigned char> rowbuf;

    // Refill buf from the (possibly compressed) stream.  Returns false at
    // EOF or on a decompression error (error flag set).
    bool refill() {
        if (eof) return false;
        int n = gzread(f, buf, (unsigned)kBufSize);
        pos = 0;
        if (n <= 0) {
            len = 0;
            eof = true;
            if (n < 0) error = true;  // corrupt gzip stream
            return false;
        }
        len = (size_t)n;
        return true;
    }
    int peek() {
        if (pos >= len && !refill()) return -1;
        return buf[pos];
    }
    void skip_line() {
        for (;;) {
            if (pos >= len && !refill()) return;
            unsigned char* nl =
                (unsigned char*)memchr(buf + pos, '\n', len - pos);
            if (nl) { pos = nl - buf + 1; return; }
            pos = len;
        }
    }
};

// Copy sequence bytes of the current line into dst[have..cap), stopping at
// newline OR when cap is reached.  Returns new have; sets *line_done when
// the newline was consumed.  Never reads past the record's sequence.
long fill_from_line(Reader* r, unsigned char* dst, long cap, long have,
                    bool* line_done) {
    *line_done = false;
    for (;;) {
        if (r->pos >= r->len && !r->refill()) {
            *line_done = true;
            return have;
        }
        unsigned char* start = r->buf + r->pos;
        size_t avail = r->len - r->pos;
        unsigned char* nl = (unsigned char*)memchr(start, '\n', avail);
        size_t n = nl ? (size_t)(nl - start) : avail;
        size_t copy_n = n;
        if (nl && copy_n > 0 && start[copy_n - 1] == '\r') copy_n--;
        long room = cap - have;
        if ((long)copy_n <= room) {
            if (copy_n) memcpy(dst + have, start, copy_n);
            have += (long)copy_n;
            r->pos += n + (nl ? 1 : 0);
            if (nl) { *line_done = true; return have; }
            // buffer exhausted mid-line (except possible trailing \r split:
            // rare; a split "\r\n" leaves the \r copied -- tolerate by
            // stripping below)
            if (have > 0 && dst[have - 1] == '\r' && r->peek() == '\n') {
                have--;
            }
        } else {
            if (room > 0) memcpy(dst + have, start, room);
            r->pos += room > 0 ? (size_t)room : 0;
            return cap;  // row full, line NOT done
        }
    }
}

// Count remaining bases on the current line without storing (quality skip).
long long count_line(Reader* r) {
    long long count = 0;
    for (;;) {
        if (r->pos >= r->len && !r->refill()) return count;
        unsigned char* start = r->buf + r->pos;
        size_t avail = r->len - r->pos;
        unsigned char* nl = (unsigned char*)memchr(start, '\n', avail);
        size_t n = nl ? (size_t)(nl - start) : avail;
        size_t c = n;
        if (nl && c > 0 && start[c - 1] == '\r') c--;
        count += (long long)c;
        r->pos += n + (nl ? 1 : 0);
        if (nl) return count;
    }
}

// True when the reader sits at the end of the current record's sequence.
bool at_seq_end(Reader* r) {
    int p = r->peek();
    if (p < 0) return true;
    if (r->format == 1) return p == '>';
    return p == '+';
}

// Consume the FASTQ '+' line and the quality bytes for seq_total bases.
bool skip_quality(Reader* r) {
    if (r->peek() != '+') return r->eof;  // truncated file tolerated at EOF
    r->skip_line();
    long long q = 0;
    while (q < r->seq_total) {
        long long before = q;
        q += count_line(r);
        if (q == before && r->eof) break;
    }
    return true;
}

}  // namespace

extern "C" {

void* fastx_open(const char* path) {
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    gzbuffer(f, kBufSize);  // large inflate buffer for throughput
    Reader* r = new Reader();
    r->f = f;
    int c = r->peek();
    if (c == '>') r->format = 1;
    else if (c == '@') r->format = 2;
    else { gzclose(f); delete r; return nullptr; }
    return r;
}

int fastx_format(void* handle) {
    Reader* r = (Reader*)handle;
    return r ? r->format : 0;
}

void fastx_close(void* handle) {
    Reader* r = (Reader*)handle;
    if (r) {
        if (r->f) gzclose(r->f);
        delete r;
    }
}

// One record per row (truncated at L; TRUE length in lengths[]).
long long fastx_next_batch(void* handle, unsigned char* batch, long long B,
                           long long L, long long* lengths) {
    Reader* r = (Reader*)handle;
    if (!r || r->error || r->in_record) return -1;
    long long nrec = 0;
    while (nrec < B) {
        int c = r->peek();
        if (c < 0) break;
        int head = r->format == 1 ? '>' : '@';
        if (c != head) { r->error = true; return -1; }
        r->skip_line();
        unsigned char* dst = batch + nrec * L;
        long long have = 0;   // true record length
        long stored = 0;      // bytes stored into the row (<= L)
        while (!at_seq_end(r)) {
            if (stored < L) {
                bool done;
                long before = stored;
                stored = fill_from_line(r, dst, (long)L, stored, &done);
                have += stored - before;
                if (!done && stored >= L) have += count_line(r);
            } else {
                have += count_line(r);
            }
        }
        r->seq_total = have;
        if (r->format == 2 && !skip_quality(r)) { r->error = true; return -1; }
        lengths[nrec] = have;
        nrec++;
        r->records++;
    }
    return nrec;
}

namespace {

// Fill ONE chunked row into dst (pre-filled with 'N' padding by the caller).
// Returns 2 = row produced (*have_out set), 1 = halo-only row suppressed
// (caller should retry), 0 = EOF, -1 = parse error (Reader error flag set).
int next_chunked_row(Reader* r, unsigned char* dst, long long L,
                     long long overlap, long* have_out) {
    long have = 0;
    if (!r->in_record) {
        int c = r->peek();
        if (c < 0) return 0;
        int head = r->format == 1 ? '>' : '@';
        if (c != head) { r->error = true; return -1; }
        r->skip_line();
        r->seq_total = 0;
        r->carry_len = 0;
    } else {
        memcpy(dst, r->carry, r->carry_len);
        have = r->carry_len;
    }
    // fill the row from sequence lines
    bool ended = false;
    while (have < L) {
        if (at_seq_end(r)) { ended = true; break; }
        bool done;
        have = fill_from_line(r, dst, (long)L, have, &done);
    }
    long fresh = have - (r->in_record ? r->carry_len : 0);
    r->seq_total += fresh;
    if (!ended && at_seq_end(r)) ended = true;
    if (ended) {
        if (r->format == 2 && !skip_quality(r)) {
            r->error = true;
            return -1;
        }
        r->in_record = false;
        r->records++;
        // suppress halo-only rows: if this row holds only the carry
        // (no fresh bases) it contains no new k-window; skip it
        if (r->carry_len > 0 && fresh == 0) return 1;
    } else {
        // row full, record continues: stash the last `overlap` bases
        memcpy(r->carry, dst + (L - overlap), overlap);
        r->carry_len = (long)overlap;
        r->in_record = true;
    }
    *have_out = have;
    return 2;
}

}  // namespace

// Chunked: long records split into rows with `overlap`-base halo; chunk
// state persists across calls.  lengths[] receives per-ROW base counts
// (always <= L).  Returns rows delivered; 0 at EOF; -1 on error.
long long fastx_next_batch_chunked(void* handle, unsigned char* batch,
                                   long long B, long long L,
                                   long long overlap, long long* lengths) {
    Reader* r = (Reader*)handle;
    if (!r || r->error) return -1;
    if (overlap < 0 || overlap >= L || overlap > kMaxOverlap) return -1;
    long long nrow = 0;
    while (nrow < B) {
        long have;
        int s = next_chunked_row(r, batch + nrow * L, L, overlap, &have);
        if (s < 0) return -1;
        if (s == 0) break;
        if (s == 1) continue;
        lengths[nrow] = have;
        nrow++;
    }
    return nrow;
}

// Chunked + fused 2-bit pack: same row semantics as
// fastx_next_batch_chunked, but rows are delivered PACKED -- per row,
// L/16 uint32 code words (16 bases/word, LSB-first, A=0 C=1 G=2 T=3) and
// L/32 uint32 validity words (1 bit/base, LSB-first; 'N'/padding = 0).
// This is the device-upload ingest path: 0.375 B/base instead of 1 B/base
// of ASCII through the host->device tunnel.  Requires L % 32 == 0.
long long fastx_next_batch_chunked_packed(void* handle, uint32_t* words,
                                          uint32_t* validbits, long long B,
                                          long long L, long long overlap,
                                          long long* lengths) {
    Reader* r = (Reader*)handle;
    if (!r || r->error) return -1;
    if (overlap < 0 || overlap >= L || overlap > kMaxOverlap) return -1;
    if (L % 32 != 0) return -1;
    const long long wpr = L / 16;   // code words per row
    const long long vpr = L / 32;   // validity words per row
    r->rowbuf.resize((size_t)L);
    long long nrow = 0;
    while (nrow < B) {
        memset(r->rowbuf.data(), 'N', (size_t)L);
        long have;
        int s = next_chunked_row(r, r->rowbuf.data(), L, overlap, &have);
        if (s < 0) return -1;
        if (s == 0) break;
        if (s == 1) continue;
        uint32_t* wrow = words + nrow * wpr;
        uint32_t* vrow = validbits + nrow * vpr;
        memset(vrow, 0, (size_t)vpr * 4);
        const unsigned char* src = r->rowbuf.data();
        for (long long w = 0; w < wpr; ++w) {
            uint32_t acc = 0;
            const unsigned char* p = src + w * 16;
            uint32_t vbits = 0;
            for (int i = 0; i < 16; ++i) {
                unsigned char ch = p[i] | 0x20;  // lowercase
                uint32_t internal = (ch >> 1) & 3;
                uint32_t code = internal ^ (internal >> 1);
                bool ok = (ch == 'a') | (ch == 'c') | (ch == 'g') |
                          (ch == 't');
                acc |= (ok ? code : 0u) << (i * 2);
                vbits |= (ok ? 1u : 0u) << i;
            }
            wrow[w] = acc;
            vrow[w >> 1] |= vbits << ((w & 1) * 16);
        }
        lengths[nrow] = have;
        nrow++;
    }
    return nrow;
}

// ---------------------------------------------------------------------------
// Host-side 2-bit packer (SeqVector loader path): ASCII -> uint32 words,
// 16 bases/word LSB-first, A=0 C=1 G=2 T=3; invalid bases -> code 0 with a
// separate validity bitmap (1 bit per base, little-endian u64 words).
// ---------------------------------------------------------------------------

void pack2bit(const unsigned char* ascii, long long n, uint32_t* words,
              uint64_t* valid_bitmap) {
    long long n_words = (n + 15) / 16;
    for (long long w = 0; w < n_words; ++w) {
        uint32_t acc = 0;
        long long base = w * 16;
        long long end = base + 16 < n ? base + 16 : n;
        for (long long i = base; i < end; ++i) {
            unsigned char ch = ascii[i] | 0x20;  // lowercase
            uint32_t internal = (ch >> 1) & 3;
            uint32_t code = internal ^ (internal >> 1);
            bool ok = (ch == 'a') | (ch == 'c') | (ch == 'g') | (ch == 't');
            acc |= (ok ? code : 0u) << ((i - base) * 2);
            if (valid_bitmap && ok)
                valid_bitmap[i >> 6] |= 1ull << (i & 63);
        }
        words[w] = acc;
    }
}

}  // extern "C"

// Native SPM tokenizer core (host hot path for long prompts).
//
// Exact port of llama_box_tpu/tokenizer/spm.py's bigram-merge loop
// (greedy merge by vocab score with the same tie-breaking: score desc,
// then left index asc) including the resegment + byte-fallback path.
// The Python side prepares the text (space prefix + U+2581 substitution)
// and owns special-token splitting; this core only merges.
//
// C ABI, bound via ctypes (tokenizer/native_spm.py).

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SpmVocab {
    std::unordered_map<std::string, int32_t> piece_to_id;
    std::vector<float> scores;
    int32_t byte_pieces[256];
    int32_t unk_id;
};

struct Cand {
    float score;
    int32_t left;
    int32_t right;
    int32_t merged_len;  // bytes; guards against stale merges
};

struct CandCmp {
    bool operator()(const Cand& a, const Cand& b) const {
        if (a.score != b.score) return a.score < b.score;   // max-heap
        if (a.left != b.left) return a.left > b.left;       // then min left
        return a.right > b.right;
    }
};

inline int cp_len(uint8_t b0) {
    if (b0 < 0x80) return 1;
    if (b0 < 0xE0) return 2;
    if (b0 < 0xF0) return 3;
    return 4;
}

}  // namespace

extern "C" {

void* lbox_spm_new(const char* pieces, const int32_t* lens, const float* scores,
                   int64_t n, int32_t unk_id) {
    auto* v = new SpmVocab();
    v->unk_id = unk_id;
    v->scores.assign(scores, scores + n);
    for (int i = 0; i < 256; ++i) v->byte_pieces[i] = -1;
    const char* p = pieces;
    for (int64_t i = 0; i < n; ++i) {
        std::string piece(p, lens[i]);
        p += lens[i];
        v->piece_to_id.emplace(piece, (int32_t)i);
        if (piece.size() == 6 && piece.rfind("<0x", 0) == 0 &&
            piece[5] == '>') {
            char* end = nullptr;
            long byte = strtol(piece.c_str() + 3, &end, 16);
            if (end == piece.c_str() + 5 && byte >= 0 && byte < 256)
                v->byte_pieces[byte] = (int32_t)i;
        }
    }
    return v;
}

void lbox_spm_free(void* h) { delete static_cast<SpmVocab*>(h); }

// text: prepared UTF-8 (space-prefixed, U+2581-substituted).
// Returns number of ids written, or -1 if out buffer too small.
int64_t lbox_spm_encode(void* h, const char* text, int64_t text_len,
                        int32_t* out, int64_t max_out) {
    auto* v = static_cast<SpmVocab*>(h);
    if (text_len <= 0) return 0;

    // initial symbols: one per codepoint, stored as (offset, len) into text
    std::vector<int32_t> off, len, prev, nxt;
    std::vector<char> alive;
    for (int64_t i = 0; i < text_len;) {
        int l = cp_len((uint8_t)text[i]);
        if (i + l > text_len) l = 1;
        off.push_back((int32_t)i);
        len.push_back(l);
        i += l;
    }
    int32_t n = (int32_t)off.size();
    prev.resize(n);
    nxt.resize(n);
    alive.assign(n, 1);
    for (int32_t i = 0; i < n; ++i) {
        prev[i] = i - 1;
        nxt[i] = (i + 1 < n) ? i + 1 : -1;
    }

    std::priority_queue<Cand, std::vector<Cand>, CandCmp> heap;
    std::string tmp;
    auto try_add = [&](int32_t left) {
        int32_t right = nxt[left];
        if (right == -1) return;
        tmp.assign(text + off[left], (size_t)(len[left]));
        tmp.append(text + off[right], (size_t)(len[right]));
        auto it = v->piece_to_id.find(tmp);
        if (it != v->piece_to_id.end()) {
            heap.push({v->scores[it->second], left, right,
                       len[left] + len[right]});
        }
    };
    for (int32_t i = 0; i + 1 < n; ++i) try_add(i);

    while (!heap.empty()) {
        Cand c = heap.top();
        heap.pop();
        if (!alive[c.left] || !alive[c.right]) continue;
        if (nxt[c.left] != c.right) continue;
        if (len[c.left] + len[c.right] != c.merged_len) continue;
        // merge right into left (symbols are contiguous text slices)
        len[c.left] += len[c.right];
        alive[c.right] = 0;
        nxt[c.left] = nxt[c.right];
        if (nxt[c.right] != -1) prev[nxt[c.right]] = c.left;
        if (prev[c.left] != -1) try_add(prev[c.left]);
        try_add(c.left);
    }

    int64_t m = 0;
    auto emit = [&](int32_t id) -> bool {
        if (m >= max_out) return false;
        out[m++] = id;
        return true;
    };
    for (int32_t i = 0; i != -1; i = nxt[i]) {
        if (!alive[i]) continue;
        tmp.assign(text + off[i], (size_t)len[i]);
        auto it = v->piece_to_id.find(tmp);
        if (it != v->piece_to_id.end()) {
            if (!emit(it->second)) return -1;
            continue;
        }
        bool split = false;
        if (tmp.size() > 1) {  // resegment into two known sub-pieces
            for (size_t cut = 1; cut < tmp.size() && !split; ++cut) {
                auto a = v->piece_to_id.find(tmp.substr(0, cut));
                if (a == v->piece_to_id.end()) continue;
                auto b = v->piece_to_id.find(tmp.substr(cut));
                if (b == v->piece_to_id.end()) continue;
                if (!emit(a->second) || !emit(b->second)) return -1;
                split = true;
            }
        }
        if (split) continue;
        for (unsigned char byte : tmp) {  // byte fallback
            int32_t bid = v->byte_pieces[byte];
            if (bid >= 0) {
                if (!emit(bid)) return -1;
            } else if (v->unk_id >= 0) {
                if (!emit(v->unk_id)) return -1;
            }
        }
    }
    return m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native byte-level BPE core (gpt2-family tokenizers).
//
// Exact port of llama_box_tpu/tokenizer/bpe.py's _bpe_word loop: repeatedly
// merge the adjacent pair with the LOWEST merge rank, leftmost on ties,
// until no mergeable pair remains. The Python side owns the pre-tokenizer
// regex and byte->unicode mapping; this core merges one mapped word.

namespace {

struct BpeVocab {
    std::unordered_map<std::string, int32_t> piece_to_id;
    std::unordered_map<std::string, int32_t> merge_rank;  // "left\x1fright"
};

struct BpeCand {
    int32_t rank;
    int32_t left;
    int32_t right;
    int32_t merged_len;
};

struct BpeCmp {  // min-heap: lowest rank first, then leftmost
    bool operator()(const BpeCand& a, const BpeCand& b) const {
        if (a.rank != b.rank) return a.rank > b.rank;
        return a.left > b.left;
    }
};

inline std::string bpe_key(const std::string& l, const std::string& r) {
    std::string k = l;
    k.push_back('\x1f');
    k += r;
    return k;
}

}  // namespace

extern "C" {

void* lbox_bpe_new(const char* pieces, const int32_t* piece_lens,
                   int64_t n_vocab, const char* merges_l,
                   const int32_t* l_lens, const char* merges_r,
                   const int32_t* r_lens, int64_t n_merges) {
    auto* v = new BpeVocab();
    const char* p = pieces;
    for (int64_t i = 0; i < n_vocab; ++i) {
        v->piece_to_id.emplace(std::string(p, piece_lens[i]), (int32_t)i);
        p += piece_lens[i];
    }
    const char* pl = merges_l;
    const char* pr = merges_r;
    for (int64_t i = 0; i < n_merges; ++i) {
        std::string l(pl, l_lens[i]);
        std::string r(pr, r_lens[i]);
        pl += l_lens[i];
        pr += r_lens[i];
        v->merge_rank.emplace(bpe_key(l, r), (int32_t)i);
    }
    return v;
}

void lbox_bpe_free(void* h) { delete static_cast<BpeVocab*>(h); }

// word: byte-unicode-mapped UTF-8. Returns ids written, or -1 if out too
// small. Unknown merged symbols fall back to per-codepoint ids (unknown
// codepoints are skipped), matching the Python encode().
int64_t lbox_bpe_encode(void* h, const char* word, int64_t word_len,
                        int32_t* out, int64_t max_out) {
    auto* v = static_cast<BpeVocab*>(h);
    if (word_len <= 0) return 0;

    std::vector<int32_t> off, len, nxt;
    std::vector<char> alive;
    for (int64_t i = 0; i < word_len;) {
        int l = cp_len((uint8_t)word[i]);
        if (i + l > word_len) l = 1;
        off.push_back((int32_t)i);
        len.push_back(l);
        i += l;
    }
    int32_t n = (int32_t)off.size();
    nxt.resize(n);
    std::vector<int32_t> prev(n);
    alive.assign(n, 1);
    for (int32_t i = 0; i < n; ++i) {
        prev[i] = i - 1;
        nxt[i] = (i + 1 < n) ? i + 1 : -1;
    }

    std::priority_queue<BpeCand, std::vector<BpeCand>, BpeCmp> heap;
    std::string tmp;
    auto try_add = [&](int32_t left) {
        int32_t right = nxt[left];
        if (right == -1) return;
        tmp = bpe_key(std::string(word + off[left], (size_t)len[left]),
                      std::string(word + off[right], (size_t)len[right]));
        auto it = v->merge_rank.find(tmp);
        if (it != v->merge_rank.end()) {
            heap.push({it->second, left, right, len[left] + len[right]});
        }
    };
    for (int32_t i = 0; i + 1 < n; ++i) try_add(i);

    while (!heap.empty()) {
        BpeCand c = heap.top();
        heap.pop();
        if (!alive[c.left] || !alive[c.right]) continue;
        if (nxt[c.left] != c.right) continue;
        if (len[c.left] + len[c.right] != c.merged_len) continue;
        len[c.left] += len[c.right];
        alive[c.right] = 0;
        nxt[c.left] = nxt[c.right];
        if (nxt[c.right] != -1) prev[nxt[c.right]] = c.left;
        if (prev[c.left] != -1) try_add(prev[c.left]);
        try_add(c.left);
    }

    int64_t m = 0;
    auto emit = [&](int32_t id) -> bool {
        if (m >= max_out) return false;
        out[m++] = id;
        return true;
    };
    for (int32_t i = 0; i != -1; i = nxt[i]) {
        if (!alive[i]) continue;
        std::string sym(word + off[i], (size_t)len[i]);
        auto it = v->piece_to_id.find(sym);
        if (it != v->piece_to_id.end()) {
            if (!emit(it->second)) return -1;
            continue;
        }
        for (size_t j = 0; j < sym.size();) {  // per-codepoint fallback
            int l = cp_len((uint8_t)sym[j]);
            if (j + l > sym.size()) l = 1;
            auto ci = v->piece_to_id.find(sym.substr(j, l));
            if (ci != v->piece_to_id.end()) {
                if (!emit(ci->second)) return -1;
            }
            j += l;
        }
    }
    return m;
}

}  // extern "C"

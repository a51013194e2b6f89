// Packed-postings BM25 scoring core for the keyword index.
//
// The ES-server replacement's hot path (reference utils/keyword_store.py
// delegates scoring to the Elasticsearch JVM; here the Python KeywordIndex
// delegates per-field BM25 to this core when available).  Tokenization and
// field boosts stay in Python — this layer sees integer token ids only.
//
// Lucene-style BM25: k1=1.2, b=0.75,
//   idf = ln(1 + (N - df + 0.5) / (df + 0.5))
//   tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
// A document scores only if it matches >= min_required distinct terms
// (minimum_should_match).
//
// Persistence support: postings export/import as COO triplets
// (token, doc, tf) plus per-doc lengths, so a saved index reloads without
// re-tokenizing the corpus (the round-1 load() bottleneck).

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>
#include <cmath>

namespace {

constexpr double kK1 = 1.2;
constexpr double kB = 0.75;
constexpr int32_t kMaxFields = 16;

struct Posting {
  int64_t doc;
  int32_t tf;
};

struct Field {
  std::unordered_map<int64_t, std::vector<Posting>> postings;  // token -> docs
  std::unordered_map<int64_t, int64_t> doc_len;                // doc -> length
  std::unordered_map<int64_t, std::vector<int64_t>> doc_terms; // doc -> tokens
  int64_t total_len = 0;
  // cached per-doc BM25 length norm k1*(1-b+b*dl/avgdl), rebuilt lazily
  // after mutations (avgdl moves with every add)
  std::vector<double> norm;
  bool norm_dirty = true;
};

struct Index {
  std::vector<Field> fields;
  std::unordered_map<int64_t, bool> docs;  // live docs
  int64_t max_doc = -1;  // doc ids are dense rows; bounds scoring scratch
  // persistent scoring scratch: zeroed once, reset via the touched list
  // after each call — per-call cost is O(matched postings), not O(corpus)
  // (the per-call vector<double>(slots) memset was ~40% of query time at
  // 1M docs)
  std::vector<double> scratch_scores;
  std::vector<int32_t> scratch_matched;
  std::vector<int64_t> touched;
  // ctypes releases the GIL for every call, and the threaded WSGI server
  // scores concurrently — the shared scratch (and postings mutation vs
  // scoring) must serialize.  Scoring is ~ms even at 1M docs, so one
  // mutex per index is cheap relative to losing scratch persistence.
  std::mutex mu;
  explicit Index(int32_t n_fields) : fields(n_fields) {}
};

}  // namespace

extern "C" {

void* pse_bm25_new(int32_t n_fields) {
  if (n_fields <= 0 || n_fields > kMaxFields) return nullptr;
  return new Index(n_fields);
}

void pse_bm25_free(void* handle) { delete static_cast<Index*>(handle); }

int64_t pse_bm25_doc_count(void* handle) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  return static_cast<int64_t>(index->docs.size());
}

// Tokens may repeat; term frequencies are accumulated here.
void pse_bm25_add_doc(void* handle, int64_t doc, int32_t field_id,
                      const int64_t* tokens, int64_t n_tokens) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return;
  Field& field = index->fields[field_id];
  index->docs[doc] = true;
  if (doc > index->max_doc) index->max_doc = doc;

  auto it = field.doc_len.find(doc);
  if (it != field.doc_len.end()) {
    // re-adding a field for an existing doc: caller must remove_doc first;
    // ignore to keep postings consistent
    return;
  }
  field.doc_len[doc] = n_tokens;
  field.total_len += n_tokens;
  field.norm_dirty = true;

  std::unordered_map<int64_t, int32_t> counts;
  counts.reserve(n_tokens);
  for (int64_t i = 0; i < n_tokens; ++i) ++counts[tokens[i]];
  std::vector<int64_t>& terms = field.doc_terms[doc];
  terms.reserve(counts.size());
  for (const auto& [token, tf] : counts) {
    field.postings[token].push_back(Posting{doc, tf});
    terms.push_back(token);
  }
}

// Targeted removal: only the postings lists of the doc's own terms are
// touched (doc_terms back-pointers), not the whole vocabulary.
void pse_bm25_remove_doc(void* handle, int64_t doc) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  index->docs.erase(doc);
  for (Field& field : index->fields) {
    auto len_it = field.doc_len.find(doc);
    if (len_it == field.doc_len.end()) continue;
    field.total_len -= len_it->second;
    field.doc_len.erase(len_it);
    field.norm_dirty = true;
    auto terms_it = field.doc_terms.find(doc);
    if (terms_it != field.doc_terms.end()) {
      for (int64_t token : terms_it->second) {
        auto post_it = field.postings.find(token);
        if (post_it == field.postings.end()) continue;
        std::vector<Posting>& postings = post_it->second;
        for (size_t i = 0; i < postings.size(); ++i) {
          if (postings[i].doc == doc) {
            postings[i] = postings.back();
            postings.pop_back();
            break;
          }
        }
        if (postings.empty()) field.postings.erase(post_it);
      }
      field.doc_terms.erase(terms_it);
    }
  }
}

// ---------------------------------------------------------------------------
// Persistence: COO export / bulk import.

int64_t pse_bm25_field_nnz(void* handle, int32_t field_id) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  int64_t nnz = 0;
  for (const auto& [token, postings] : index->fields[field_id].postings)
    nnz += static_cast<int64_t>(postings.size());
  return nnz;
}

int64_t pse_bm25_field_doc_count(void* handle, int32_t field_id) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  return static_cast<int64_t>(index->fields[field_id].doc_len.size());
}

// Writes the field's postings as (token, doc, tf) triplets.  Returns the
// number of triplets; writes nothing when capacity is insufficient (callers
// size the buffers with pse_bm25_field_nnz first).
int64_t pse_bm25_export_field(void* handle, int32_t field_id,
                              int64_t* out_tokens, int64_t* out_docs,
                              int32_t* out_tfs, int64_t capacity) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  const Field& field = index->fields[field_id];
  int64_t nnz = 0;  // inline (field_nnz would re-lock the non-recursive mu)
  for (const auto& [token, postings] : field.postings)
    nnz += static_cast<int64_t>(postings.size());
  if (nnz > capacity) return nnz;
  int64_t written = 0;
  for (const auto& [token, postings] : field.postings) {
    for (const Posting& posting : postings) {
      out_tokens[written] = token;
      out_docs[written] = posting.doc;
      out_tfs[written] = posting.tf;
      ++written;
    }
  }
  return written;
}

// Writes (doc, length) pairs; same capacity contract as export_field.
int64_t pse_bm25_export_doc_lens(void* handle, int32_t field_id,
                                 int64_t* out_docs, int64_t* out_lens,
                                 int64_t capacity) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  const Field& field = index->fields[field_id];
  int64_t count = static_cast<int64_t>(field.doc_len.size());
  if (count > capacity) return count;
  int64_t written = 0;
  for (const auto& [doc, len] : field.doc_len) {
    out_docs[written] = doc;
    out_lens[written] = len;
    ++written;
  }
  return written;
}

// Bulk import of one field from COO triplets + per-doc lengths.  The field
// must be empty (fresh index); doc_terms back-pointers are rebuilt so later
// removals stay targeted.
void pse_bm25_load_field(void* handle, int32_t field_id,
                         const int64_t* tokens, const int64_t* docs,
                         const int32_t* tfs, int64_t nnz,
                         const int64_t* len_docs, const int64_t* lens,
                         int64_t n_docs) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return;
  Field& field = index->fields[field_id];
  field.postings.reserve(nnz / 4 + 16);
  field.doc_terms.reserve(n_docs + 16);
  for (int64_t i = 0; i < nnz; ++i) {
    field.postings[tokens[i]].push_back(Posting{docs[i], tfs[i]});
    field.doc_terms[docs[i]].push_back(tokens[i]);
  }
  field.doc_len.reserve(n_docs + 16);
  for (int64_t i = 0; i < n_docs; ++i) {
    field.doc_len[len_docs[i]] = lens[i];
    field.total_len += lens[i];
    index->docs[len_docs[i]] = true;
    if (len_docs[i] > index->max_doc) index->max_doc = len_docs[i];
  }
  field.norm_dirty = true;
}

// Scores one field for the (deduplicated) query tokens.  Writes up to
// `buffer_capacity` (doc, score, matched-term-count) triplets for documents
// matching at least `min_required` distinct terms; returns the number
// written (or the required size if larger, with nothing written beyond
// capacity).  The matched counts let the caller find docs containing ALL
// terms (phrase candidates) without a second pass.
// `allowed` (optional, may be null): a per-row byte mask — postings whose
// doc is filtered out are skipped BEFORE scoring, so a selective EXIF
// filter cuts the BM25 work by its selectivity (the reference's ES filter
// clauses compose with scoring the same way, keyword_store.py:315-345).
int64_t pse_bm25_score_field_masked(void* handle, int32_t field_id,
                                    const int64_t* terms, int64_t n_terms,
                                    int64_t min_required,
                                    const uint8_t* allowed,
                                    int64_t* out_docs, double* out_scores,
                                    int64_t* out_matched,
                                    int64_t buffer_capacity) {
  Index* index = static_cast<Index*>(handle);
  std::lock_guard<std::mutex> lock(index->mu);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  const Field& field = index->fields[field_id];
  const double n_docs = static_cast<double>(
      index->docs.empty() ? 1 : index->docs.size());
  const double avgdl =
      field.doc_len.empty()
          ? 0.0
          : static_cast<double>(field.total_len) / field.doc_len.size();

  // Doc ids are dense rows (the Python owner allocates them contiguously),
  // so flat scratch vectors beat hash maps by ~5x on 100k-doc fields.
  const int64_t slots = index->max_doc + 1;
  if (static_cast<int64_t>(index->scratch_scores.size()) < slots) {
    index->scratch_scores.assign(slots, 0.0);
    index->scratch_matched.assign(slots, 0);
  }
  std::vector<double>& scores = index->scratch_scores;
  std::vector<int32_t>& matched = index->scratch_matched;
  std::vector<int64_t>& touched = index->touched;
  Field& mutable_field = static_cast<Index*>(handle)->fields[field_id];
  if (mutable_field.norm_dirty ||
      static_cast<int64_t>(mutable_field.norm.size()) != slots) {
    mutable_field.norm.assign(slots, kK1 * (1.0 - kB));
    if (avgdl > 0) {
      for (const auto& [doc, dl] : mutable_field.doc_len)
        mutable_field.norm[doc] = kK1 * (1.0 - kB + kB * double(dl) / avgdl);
    }
    mutable_field.norm_dirty = false;
  }
  const std::vector<double>& norm = mutable_field.norm;
  for (int64_t t = 0; t < n_terms; ++t) {
    auto it = field.postings.find(terms[t]);
    if (it == field.postings.end() || it->second.empty()) continue;
    const double df = static_cast<double>(it->second.size());
    const double idf = std::log(1.0 + (n_docs - df + 0.5) / (df + 0.5));
    for (const Posting& posting : it->second) {
      if (allowed && !allowed[posting.doc]) continue;
      const double denom = posting.tf + norm[posting.doc];
      scores[posting.doc] += idf * (posting.tf * (kK1 + 1.0) / denom);
      if (matched[posting.doc]++ == 0) touched.push_back(posting.doc);
    }
  }

  int64_t written = 0;
  int64_t qualifying = 0;
  for (int64_t doc : touched) {
    const int32_t m = matched[doc];
    if (m >= min_required) {
      if (qualifying < buffer_capacity) {
        out_docs[written] = doc;
        out_scores[written] = scores[doc];
        out_matched[written] = m;
        ++written;
      }
      ++qualifying;
    }
    scores[doc] = 0.0;  // reset only what this call touched
    matched[doc] = 0;
  }
  touched.clear();
  return qualifying;
}

int64_t pse_bm25_score_field(void* handle, int32_t field_id,
                             const int64_t* terms, int64_t n_terms,
                             int64_t min_required, int64_t* out_docs,
                             double* out_scores, int64_t* out_matched,
                             int64_t buffer_capacity) {
  return pse_bm25_score_field_masked(handle, field_id, terms, n_terms,
                                     min_required, nullptr, out_docs,
                                     out_scores, out_matched,
                                     buffer_capacity);
}

}  // extern "C"

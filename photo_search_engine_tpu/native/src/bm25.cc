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

#include <cstdint>
#include <cstring>
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
  int64_t total_len = 0;
};

struct Index {
  std::vector<Field> fields;
  std::unordered_map<int64_t, bool> docs;  // live docs
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
  return static_cast<int64_t>(static_cast<Index*>(handle)->docs.size());
}

// Tokens may repeat; term frequencies are accumulated here.
void pse_bm25_add_doc(void* handle, int64_t doc, int32_t field_id,
                      const int64_t* tokens, int64_t n_tokens) {
  Index* index = static_cast<Index*>(handle);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return;
  Field& field = index->fields[field_id];
  index->docs[doc] = true;

  auto it = field.doc_len.find(doc);
  if (it != field.doc_len.end()) {
    // re-adding a field for an existing doc: caller must remove_doc first;
    // ignore to keep postings consistent
    return;
  }
  field.doc_len[doc] = n_tokens;
  field.total_len += n_tokens;

  std::unordered_map<int64_t, int32_t> counts;
  counts.reserve(n_tokens);
  for (int64_t i = 0; i < n_tokens; ++i) ++counts[tokens[i]];
  for (const auto& [token, tf] : counts) {
    field.postings[token].push_back(Posting{doc, tf});
  }
}

void pse_bm25_remove_doc(void* handle, int64_t doc) {
  Index* index = static_cast<Index*>(handle);
  index->docs.erase(doc);
  for (Field& field : index->fields) {
    auto it = field.doc_len.find(doc);
    if (it == field.doc_len.end()) continue;
    field.total_len -= it->second;
    field.doc_len.erase(it);
    for (auto& [token, postings] : field.postings) {
      for (size_t i = 0; i < postings.size(); ++i) {
        if (postings[i].doc == doc) {
          postings[i] = postings.back();
          postings.pop_back();
          break;
        }
      }
    }
  }
}

// Scores one field for the (deduplicated) query tokens.  Writes up to
// `buffer_capacity` (doc, score) pairs for documents matching at least
// `min_required` distinct terms; returns the number written (or the
// required size if larger, with nothing written beyond capacity).
int64_t pse_bm25_score_field(void* handle, int32_t field_id,
                             const int64_t* terms, int64_t n_terms,
                             int64_t min_required, int64_t* out_docs,
                             double* out_scores, int64_t buffer_capacity) {
  Index* index = static_cast<Index*>(handle);
  if (field_id < 0 || field_id >= static_cast<int32_t>(index->fields.size()))
    return 0;
  const Field& field = index->fields[field_id];
  const double n_docs = static_cast<double>(
      index->docs.empty() ? 1 : index->docs.size());
  const double avgdl =
      field.doc_len.empty()
          ? 0.0
          : static_cast<double>(field.total_len) / field.doc_len.size();

  std::unordered_map<int64_t, double> scores;
  std::unordered_map<int64_t, int64_t> matched;
  for (int64_t t = 0; t < n_terms; ++t) {
    auto it = field.postings.find(terms[t]);
    if (it == field.postings.end() || it->second.empty()) continue;
    const double df = static_cast<double>(it->second.size());
    const double idf = std::log(1.0 + (n_docs - df + 0.5) / (df + 0.5));
    for (const Posting& posting : it->second) {
      auto len_it = field.doc_len.find(posting.doc);
      const double dl =
          len_it == field.doc_len.end() ? 0.0 : double(len_it->second);
      const double denom =
          posting.tf + kK1 * (1.0 - kB + (avgdl > 0 ? kB * dl / avgdl : 0.0));
      scores[posting.doc] += idf * (posting.tf * (kK1 + 1.0) / denom);
      ++matched[posting.doc];
    }
  }

  int64_t written = 0;
  for (const auto& [doc, score] : scores) {
    if (matched[doc] < min_required) continue;
    if (written < buffer_capacity) {
      out_docs[written] = doc;
      out_scores[written] = score;
    }
    ++written;
  }
  return written;
}

}  // extern "C"

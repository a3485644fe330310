// Native CSV loader for the UserBehavior corpus.
//
// The reference converts the 100M-row UserBehavior.csv in pure Python
// (NANN_impls/nann/data_provider/convert_UB_to_tfrecord.py:86-113, dict-based,
// ~hours). This loader does the string-heavy part natively: one pass over the
// CSV building dense id maps (insertion-ordered, 0-based) and columnar int
// arrays; the sample generation (grouping, sorting, prefix windows) then runs
// vectorised in numpy (nann_tpu/data/user_behavior.py).
//
// CSV schema: user_id,item_id,category_id,behavior_type,timestamp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Columns {
  std::vector<int32_t> user;
  std::vector<int32_t> item;
  std::vector<int32_t> cate;
  std::vector<int64_t> ts;
  std::vector<int32_t> item_cate;  // per dense item id: its dense cate id
  int32_t num_user = 0, num_item = 0, num_cate = 0;
};

inline int32_t intern(std::unordered_map<std::string, int32_t>& m,
                      const char* s, size_t len, int32_t* next_id) {
  auto it = m.find(std::string(s, len));
  if (it != m.end()) return it->second;
  int32_t id = (*next_id)++;
  m.emplace(std::string(s, len), id);
  return id;
}

}  // namespace

extern "C" {

// Parses the CSV; returns opaque handle or nullptr. Rows with fewer than 5
// fields are skipped.
void* nann_csv_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* c = new Columns();
  std::unordered_map<std::string, int32_t> users, items, cates;

  char buf[1 << 16];
  std::string carry;
  std::vector<char> line;
  while (true) {
    size_t got = std::fread(buf, 1, sizeof(buf), f);
    if (got == 0) break;
    size_t start = 0;
    for (size_t i = 0; i < got; ++i) {
      if (buf[i] != '\n') continue;
      const char* ls;
      size_t ll;
      if (!carry.empty()) {
        carry.append(buf + start, i - start);
        ls = carry.data();
        ll = carry.size();
      } else {
        ls = buf + start;
        ll = i - start;
      }
      // split into 5 fields
      const char* fields[5];
      size_t flen[5];
      int nf = 0;
      size_t fs = 0;
      for (size_t j = 0; j <= ll && nf < 5; ++j) {
        if (j == ll || ls[j] == ',') {
          fields[nf] = ls + fs;
          flen[nf] = j - fs;
          ++nf;
          fs = j + 1;
        }
      }
      if (nf == 5) {
        int32_t u = intern(users, fields[0], flen[0], &c->num_user);
        int32_t it = intern(items, fields[1], flen[1], &c->num_item);
        int32_t ca = intern(cates, fields[2], flen[2], &c->num_cate);
        int64_t t = 0;
        for (size_t j = 0; j < flen[4]; ++j) {
          char ch = fields[4][j];
          if (ch >= '0' && ch <= '9') t = t * 10 + (ch - '0');
        }
        c->user.push_back(u);
        c->item.push_back(it);
        c->cate.push_back(ca);
        c->ts.push_back(t);
        if (it >= (int32_t)c->item_cate.size()) c->item_cate.resize(it + 1, -1);
        c->item_cate[it] = ca;
      }
      carry.clear();
      start = i + 1;
    }
    if (start < got) carry.append(buf + start, got - start);
  }
  // trailing line without newline
  if (!carry.empty()) {
    // (rare path: reuse the same split by appending '\n' logic) — skip if short
    // handled above only on '\n'; process here:
    const char* ls = carry.data();
    size_t ll = carry.size();
    const char* fields[5];
    size_t flen[5];
    int nf = 0;
    size_t fs = 0;
    for (size_t j = 0; j <= ll && nf < 5; ++j) {
      if (j == ll || ls[j] == ',') {
        fields[nf] = ls + fs;
        flen[nf] = j - fs;
        ++nf;
        fs = j + 1;
      }
    }
    if (nf == 5) {
      int32_t u = intern(users, fields[0], flen[0], &c->num_user);
      int32_t it = intern(items, fields[1], flen[1], &c->num_item);
      int32_t ca = intern(cates, fields[2], flen[2], &c->num_cate);
      int64_t t = 0;
      for (size_t j = 0; j < flen[4]; ++j) {
        char ch = fields[4][j];
        if (ch >= '0' && ch <= '9') t = t * 10 + (ch - '0');
      }
      c->user.push_back(u);
      c->item.push_back(it);
      c->cate.push_back(ca);
      c->ts.push_back(t);
      if (it >= (int32_t)c->item_cate.size()) c->item_cate.resize(it + 1, -1);
      c->item_cate[it] = ca;
    }
  }
  std::fclose(f);
  return c;
}

int64_t nann_csv_num_rows(void* h) {
  return (int64_t)static_cast<Columns*>(h)->user.size();
}
int32_t nann_csv_num_users(void* h) { return static_cast<Columns*>(h)->num_user; }
int32_t nann_csv_num_items(void* h) { return static_cast<Columns*>(h)->num_item; }
int32_t nann_csv_num_cates(void* h) { return static_cast<Columns*>(h)->num_cate; }

void nann_csv_copy(void* h, int32_t* user, int32_t* item, int32_t* cate,
                   int64_t* ts) {
  auto* c = static_cast<Columns*>(h);
  std::memcpy(user, c->user.data(), c->user.size() * sizeof(int32_t));
  std::memcpy(item, c->item.data(), c->item.size() * sizeof(int32_t));
  std::memcpy(cate, c->cate.data(), c->cate.size() * sizeof(int32_t));
  std::memcpy(ts, c->ts.data(), c->ts.size() * sizeof(int64_t));
}

void nann_csv_item_cate(void* h, int32_t* out) {
  auto* c = static_cast<Columns*>(h);
  std::memcpy(out, c->item_cate.data(), c->item_cate.size() * sizeof(int32_t));
}

void nann_csv_free(void* h) { delete static_cast<Columns*>(h); }

}  // extern "C"

// kvdb: a tiny single-file sorted key-value store — the native storage
// backend behind caffe_rtpose_tpu.utils.db (the TPU-native equivalent of the
// reference's db::DB/Cursor/Transaction abstraction over LMDB/LevelDB,
// /root/reference/include/caffe/util/db.hpp + db_lmdb/db_leveldb.cpp).
//
// Design: the reference wraps LMDB (mmap'd B-tree) for sequential-scan
// training data.  The access pattern that actually matters is (a) bulk
// sequential reads by the data-loader and (b) batch writes by
// convert_imageset.  kvdb therefore uses an append-only record log plus a
// sorted offset index written at commit, and serves reads from a read-only
// mmap (zero-copy into the loader).
//
// On-disk layout (little-endian):
//   [0..8)   magic "CRTKVDB1"
//   [8..16)  u64 data_end   (offset where records end / index begins)
//   [16..24) u64 count
//   [24..)   records: u32 klen, u32 vlen, key bytes, value bytes
//   [data_end..) index: count x u64 record offsets, sorted by key (memcmp)
//
// The same format is implemented in pure Python (utils/db.py) as a fallback
// when the toolchain is unavailable; the two are byte-identical.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'C', 'R', 'T', 'K', 'V', 'D', 'B', '1'};
constexpr uint64_t kHeaderSize = 24;

struct Rec {
  uint64_t off;  // offset of the record header in the file
};

struct Kvdb {
  std::string path;
  int fd = -1;
  const uint8_t* map = nullptr;  // read mmap (readers)
  size_t map_size = 0;
  uint64_t data_end = 0;
  std::vector<uint64_t> index;          // sorted record offsets
  std::vector<std::pair<std::string, std::string>> pending;  // uncommitted puts
  bool writable = false;

  const uint8_t* key_at(uint64_t off, uint32_t* klen) const {
    std::memcpy(klen, map + off, 4);
    return map + off + 8;
  }
  const uint8_t* val_at(uint64_t off, uint32_t* vlen) const {
    uint32_t klen;
    std::memcpy(&klen, map + off, 4);
    std::memcpy(vlen, map + off + 4, 4);
    return map + off + 8 + klen;
  }
};

bool key_less(const Kvdb& db, uint64_t a_off, const uint8_t* bk, uint32_t bl) {
  uint32_t al;
  const uint8_t* ak = db.key_at(a_off, &al);
  int c = std::memcmp(ak, bk, std::min(al, bl));
  return c < 0 || (c == 0 && al < bl);
}

bool remap(Kvdb* db) {
  if (db->map) {
    munmap(const_cast<uint8_t*>(db->map), db->map_size);
    db->map = nullptr;
    db->map_size = 0;
  }
  struct stat st;
  if (fstat(db->fd, &st) != 0 || st.st_size < (off_t)kHeaderSize) return false;
  void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, db->fd, 0);
  if (m == MAP_FAILED) return false;
  db->map = static_cast<const uint8_t*>(m);
  db->map_size = st.st_size;
  if (std::memcmp(db->map, kMagic, 8) != 0) return false;
  uint64_t count;
  std::memcpy(&db->data_end, db->map + 8, 8);
  std::memcpy(&count, db->map + 16, 8);
  db->index.resize(count);
  if (count && db->data_end + count * 8 > db->map_size) return false;
  std::memcpy(db->index.data(), db->map + db->data_end, count * 8);
  return true;
}

}  // namespace

extern "C" {

// Open a db. mode: 0 read, 1 write/new (truncating only if absent).
// Returns handle or nullptr.
void* kvdb_open(const char* path, int writable) {
  Kvdb* db = new Kvdb;
  db->path = path;
  db->writable = writable != 0;
  int flags = writable ? (O_RDWR | O_CREAT) : O_RDONLY;
  db->fd = ::open(path, flags, 0644);
  if (db->fd < 0) {
    delete db;
    return nullptr;
  }
  struct stat st;
  fstat(db->fd, &st);
  if (st.st_size == 0) {
    if (!writable) {
      ::close(db->fd);
      delete db;
      return nullptr;
    }
    uint8_t header[kHeaderSize];
    std::memcpy(header, kMagic, 8);
    uint64_t data_end = kHeaderSize, count = 0;
    std::memcpy(header + 8, &data_end, 8);
    std::memcpy(header + 16, &count, 8);
    if (pwrite(db->fd, header, kHeaderSize, 0) != (ssize_t)kHeaderSize) {
      ::close(db->fd);
      delete db;
      return nullptr;
    }
  }
  if (!remap(db)) {
    ::close(db->fd);
    delete db;
    return nullptr;
  }
  return db;
}

void kvdb_close(void* h) {
  Kvdb* db = static_cast<Kvdb*>(h);
  if (!db) return;
  if (db->map) munmap(const_cast<uint8_t*>(db->map), db->map_size);
  if (db->fd >= 0) ::close(db->fd);
  delete db;
}

int64_t kvdb_count(void* h) {
  return static_cast<Kvdb*>(h)->index.size();
}

// Stage a put; visible after kvdb_commit.
int kvdb_put(void* h, const uint8_t* key, int32_t klen, const uint8_t* val,
             int32_t vlen) {
  Kvdb* db = static_cast<Kvdb*>(h);
  if (!db->writable) return -1;
  db->pending.emplace_back(std::string((const char*)key, klen),
                           std::string((const char*)val, vlen));
  return 0;
}

// Append pending records, rewrite the sorted index + header.
// Crash safety: records go AFTER the live index, the new index after them,
// both fsynced before the single-block header flip — an interrupted commit
// leaves the previous committed view fully readable.
int kvdb_commit(void* h) {
  Kvdb* db = static_cast<Kvdb*>(h);
  if (!db->writable) return -1;
  if (db->pending.empty()) return 0;
  struct stat stc;
  if (fstat(db->fd, &stc) != 0) return -1;
  uint64_t off = db->data_end + 8 * db->index.size();
  if ((uint64_t)stc.st_size > off) off = stc.st_size;
  std::vector<std::pair<std::string, uint64_t>> fresh;  // key -> offset
  std::string buf;
  for (auto& kv : db->pending) {
    uint32_t kl = kv.first.size(), vl = kv.second.size();
    fresh.emplace_back(kv.first, off + buf.size());
    buf.append((const char*)&kl, 4);
    buf.append((const char*)&vl, 4);
    buf += kv.first;
    buf += kv.second;
  }
  if (pwrite(db->fd, buf.data(), buf.size(), off) != (ssize_t)buf.size())
    return -1;
  uint64_t new_end = off + buf.size();

  // merge old index (already sorted) with fresh keys; last write wins on dup
  std::stable_sort(fresh.begin(), fresh.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  // dedup duplicate keys within this transaction: keep the LAST put
  // (stable sort preserves put order among equal keys)
  {
    std::vector<std::pair<std::string, uint64_t>> dedup;
    for (auto& kv : fresh) {
      if (!dedup.empty() && dedup.back().first == kv.first)
        dedup.back().second = kv.second;
      else
        dedup.push_back(kv);
    }
    fresh.swap(dedup);
  }
  std::vector<uint64_t> merged;
  merged.reserve(db->index.size() + fresh.size());
  // temporary map of new data for comparisons: need key bytes of old recs,
  // which live in the current mmap (still valid; data grew past it but old
  // offsets are in-range).
  size_t i = 0, j = 0;
  auto old_key = [&](size_t idx, uint32_t* l) {
    return db->key_at(db->index[idx], l);
  };
  while (i < db->index.size() && j < fresh.size()) {
    uint32_t ol;
    const uint8_t* ok = old_key(i, &ol);
    const std::string& nk = fresh[j].first;
    int c = std::memcmp(ok, nk.data(), std::min<size_t>(ol, nk.size()));
    if (c == 0) c = ol < nk.size() ? -1 : (ol > nk.size() ? 1 : 0);
    if (c < 0) {
      merged.push_back(db->index[i++]);
    } else if (c > 0) {
      merged.push_back(fresh[j++].second);
    } else {  // overwrite: new wins
      merged.push_back(fresh[j++].second);
      i++;
    }
  }
  for (; i < db->index.size(); ++i) merged.push_back(db->index[i]);
  for (; j < fresh.size(); ++j) merged.push_back(fresh[j].second);

  if (pwrite(db->fd, merged.data(), merged.size() * 8, new_end) !=
      (ssize_t)(merged.size() * 8))
    return -1;
  fsync(db->fd);  // records + new index durable before the header flip
  uint8_t header[kHeaderSize];
  std::memcpy(header, kMagic, 8);
  uint64_t count = merged.size();
  std::memcpy(header + 8, &new_end, 8);
  std::memcpy(header + 16, &count, 8);
  if (pwrite(db->fd, header, kHeaderSize, 0) != (ssize_t)kHeaderSize) return -1;
  fsync(db->fd);
  db->pending.clear();
  return remap(db) ? 0 : -1;
}

// Cursor access by ordinal position in sorted order. Returns 0 on success and
// fills pointers into the mmap (valid until the next commit/close).
int kvdb_at(void* h, int64_t pos, const uint8_t** key, int32_t* klen,
            const uint8_t** val, int32_t* vlen) {
  Kvdb* db = static_cast<Kvdb*>(h);
  if (pos < 0 || pos >= (int64_t)db->index.size()) return -1;
  uint64_t off = db->index[pos];
  uint32_t kl, vl;
  *key = db->key_at(off, &kl);
  *val = db->val_at(off, &vl);
  *klen = kl;
  *vlen = vl;
  return 0;
}

// Binary search; returns ordinal position of key, or -1-insertion_point.
int64_t kvdb_find(void* h, const uint8_t* key, int32_t klen) {
  Kvdb* db = static_cast<Kvdb*>(h);
  int64_t lo = 0, hi = (int64_t)db->index.size();
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (key_less(*db, db->index[mid], key, klen))
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo < (int64_t)db->index.size()) {
    uint32_t kl;
    const uint8_t* k = db->key_at(db->index[lo], &kl);
    if ((int32_t)kl == klen && std::memcmp(k, key, klen) == 0) return lo;
  }
  return -1 - lo;
}

}  // extern "C"

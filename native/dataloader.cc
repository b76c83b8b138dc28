// caduceus_tpu native data loader.
//
// TPU-native equivalent of the reference's data-loading hot path: pyfaidx
// FASTA access + per-item python tokenize/mask inside torch DataLoader
// worker processes (`src/dataloaders/datasets/hg38_dataset.py`,
// `configs/loader/default.yaml` num_workers). Here: an mmap'd FASTA with a
// faidx-style index, byte-table tokenization, deterministic splitmix64-based
// MLM masking, and a pthread worker pool filling a ring of batch buffers —
// one shared library, zero Python in the hot loop, exposed via ctypes
// (caduceus_tpu/data/native.py).
//
// Determinism contract: every item is a pure function of
// (seed, epoch, index) — resume needs only {epoch, counter}, matching the
// python loader and the reference's fault-tolerant-sampler semantics
// (`src/dataloaders/fault_tolerant_sampler.py`).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

// ----------------------------------------------------------------- RNG ----
// Counter-based splitmix64 — the SHARED stream of the python and native
// loaders (caduceus_tpu/data/mlm.py splitmix_* mirrors these constants and
// the draw layout exactly), so a batch is bit-identical regardless of which
// loader built it. Draw j of a stream with state `base` is
// fin(base + (j+1)*GAMMA).
constexpr uint64_t kGamma = 0x9E3779B97F4A7C15ull;

inline uint64_t sm_fin(uint64_t z) {
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

inline uint64_t sm_draw(uint64_t base, uint64_t j) {
  return sm_fin(base + (j + 1) * kGamma);
}

inline double sm_u01(uint64_t base, uint64_t j) {
  return (sm_draw(base, j) >> 11) * (1.0 / 9007199254740992.0);
}

inline uint64_t mix3(uint64_t a, uint64_t b, uint64_t c) {
  uint64_t s0 = a * kGamma ^ b * 0xC2B2AE3D27D4EB4Full ^
                (c + 0x165667B19E3779F9ull);
  return sm_fin(s0 + 2 * kGamma);  // skip one output, take the second
}

// token ids (caduceus_tpu/tokenization.py layout)
constexpr int32_t kSep = 1;
constexpr int32_t kMask = 3;
constexpr int32_t kPad = 4;
constexpr int32_t kUnk = 6;
constexpr int32_t kN = 11;

struct Contig {
  std::string name;
  int64_t length;
  int64_t offset;      // byte offset of first base
  int64_t line_bases;  // bases per line
  int64_t line_bytes;  // bytes per line incl newline
};

struct Fasta {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<Contig> contigs;
  int32_t byte_table[256];
  int32_t complement[16];
};

// --------------------------------------------------------------- FASTA ----
void build_tables(Fasta* fa) {
  for (int i = 0; i < 256; i++) fa->byte_table[i] = kUnk;
  const char* chars = "ACGTN";
  for (int i = 0; i < 5; i++) {
    fa->byte_table[(unsigned char)chars[i]] = 7 + i;
    fa->byte_table[(unsigned char)(chars[i] + 32)] = 7 + i;  // lowercase
  }
  for (int i = 0; i < 16; i++) fa->complement[i] = i;
  fa->complement[7] = 10;   // A<->T
  fa->complement[10] = 7;
  fa->complement[8] = 9;    // C<->G
  fa->complement[9] = 8;
}

}  // namespace

extern "C" {

void* fasta_open(const char* path) {
  Fasta* fa = new Fasta();
  fa->fd = open(path, O_RDONLY);
  if (fa->fd < 0) {
    delete fa;
    return nullptr;
  }
  struct stat st;
  fstat(fa->fd, &st);
  fa->size = st.st_size;
  fa->data = (const uint8_t*)mmap(nullptr, fa->size, PROT_READ, MAP_SHARED,
                                  fa->fd, 0);
  if (fa->data == MAP_FAILED) {
    close(fa->fd);
    delete fa;
    return nullptr;
  }
  madvise((void*)fa->data, fa->size, MADV_RANDOM);
  build_tables(fa);

  // index records
  size_t pos = 0;
  const uint8_t* d = fa->data;
  while (pos < fa->size) {
    if (d[pos] != '>') break;  // malformed
    size_t eol = pos;
    while (eol < fa->size && d[eol] != '\n') eol++;
    size_t name_end = pos + 1;
    while (name_end < eol && d[name_end] != ' ' && d[name_end] != '\t')
      name_end++;
    Contig c;
    c.name.assign((const char*)d + pos + 1, name_end - pos - 1);
    c.offset = eol + 1;
    // first line geometry
    size_t p = c.offset;
    size_t le = p;
    while (le < fa->size && d[le] != '\n') le++;
    int64_t lb = le - p;
    if (lb > 0 && d[le - 1] == '\r') lb--;
    c.line_bases = lb > 0 ? lb : 1;
    c.line_bytes = (int64_t)(le - p) + 1;
    // total length
    int64_t total = 0;
    while (p < fa->size && d[p] != '>') {
      size_t e = p;
      while (e < fa->size && d[e] != '\n') e++;
      int64_t bases = e - p;
      if (bases > 0 && d[e - 1] == '\r') bases--;
      total += bases;
      p = e + 1;
    }
    c.length = total;
    fa->contigs.push_back(c);
    pos = p;
  }
  return fa;
}

int fasta_num_contigs(void* h) { return (int)((Fasta*)h)->contigs.size(); }

const char* fasta_contig_name(void* h, int i) {
  return ((Fasta*)h)->contigs[i].name.c_str();
}

int64_t fasta_contig_length(void* h, int i) {
  return ((Fasta*)h)->contigs[i].length;
}

// Fetch [start, end) of contig ci as token ids into out (int32).
// Returns number of ids written (end-start), or -1 on error.
int64_t fasta_fetch_ids(void* h, int ci, int64_t start, int64_t end,
                        int32_t* out) {
  Fasta* fa = (Fasta*)h;
  if (ci < 0 || ci >= (int)fa->contigs.size()) return -1;
  const Contig& c = fa->contigs[ci];
  if (start < 0) start = 0;
  if (end > c.length) end = c.length;
  if (end <= start) return 0;
  const uint8_t* d = fa->data;
  int64_t n = 0;
  int64_t lb = c.line_bases, lw = c.line_bytes;
  int64_t i = start;
  while (i < end) {
    int64_t line = i / lb;
    int64_t col = i % lb;
    int64_t take = lb - col;
    if (take > end - i) take = end - i;
    const uint8_t* src = d + c.offset + line * lw + col;
    for (int64_t k = 0; k < take; k++) out[n++] = fa->byte_table[src[k]];
    i += take;
  }
  return n;
}

void fasta_close(void* h) {
  Fasta* fa = (Fasta*)h;
  if (fa->data) munmap((void*)fa->data, fa->size);
  if (fa->fd >= 0) close(fa->fd);
  delete fa;
}

// ------------------------------------------------------------- windows ----
// Produce one (data, target) MLM/NTP item. Mirrors HG38Dataset.get
// (caduceus_tpu/data/hg38.py): boundary clamping, optional rc-aug,
// N->PAD, MLM 80/10/10 or next-token shift.
//
// window geometry is computed by the caller (python keeps the BED logic);
// this fills data/target from (contig, start, end).
int64_t hg38_item(void* h, int ci, int64_t start, int64_t end,
                  int64_t seed, int64_t epoch, int64_t idx, int rc_aug,
                  int mlm, double mlm_prob, int add_eos, int32_t vocab_size,
                  int32_t* data, int32_t* target) {
  Fasta* fa = (Fasta*)h;
  int64_t L = end - start;
  if (L <= 0) return -1;
  std::vector<int32_t> ids(L);
  if (fasta_fetch_ids(h, ci, start, end, ids.data()) != L) return -1;

  // shared stream layout (mlm.py): draw 0 = rc coin; 1..L mask; 1+L..2L
  // replace; 1+2L..3L randomize; 1+3L..4L random token
  uint64_t base = mix3((uint64_t)seed, (uint64_t)epoch, (uint64_t)idx);
  if (rc_aug && sm_u01(base, 0) < 0.5) {
    // reverse complement in place
    for (int64_t a = 0, b = L - 1; a < b; a++, b--) {
      int32_t ta = fa->complement[ids[a] & 15];
      int32_t tb = fa->complement[ids[b] & 15];
      ids[a] = tb;
      ids[b] = ta;
    }
    if (L & 1) ids[L / 2] = fa->complement[ids[L / 2] & 15];
  }
  for (int64_t k = 0; k < L; k++)
    if (ids[k] == kN) ids[k] = kPad;

  if (mlm) {
    for (int64_t k = 0; k < L; k++) {
      int32_t tok = ids[k];
      data[k] = tok;
      bool masked = sm_u01(base, 1 + k) < mlm_prob;
      target[k] = masked ? tok : kPad;
      if (masked) {
        if (sm_u01(base, 1 + L + k) < 0.8) {
          data[k] = kMask;
        } else if (sm_u01(base, 1 + 2 * L + k) < 0.5) {
          data[k] = (int32_t)(sm_draw(base, 1 + 3 * L + k) %
                              (uint64_t)vocab_size);
        }
      }
    }
    return L;
  }
  if (add_eos) {
    // next-token with SEP terminator (python: ids+[SEP]; data=ids,
    // target=ids[1:]+[SEP]) — reference `hg38_dataset.py:214-227`
    for (int64_t k = 0; k < L - 1; k++) {
      data[k] = ids[k];
      target[k] = ids[k + 1];
    }
    data[L - 1] = ids[L - 1];
    target[L - 1] = kSep;
    return L;
  }
  // next-token without eos: data = ids[:-1], target = ids[1:]
  for (int64_t k = 0; k < L - 1; k++) {
    data[k] = ids[k];
    target[k] = ids[k + 1];
  }
  return L - 1;
}

// -------------------------------------------------------- batch loader ----
struct WindowSpec {
  int32_t contig;
  int64_t start;
  int64_t end;
};

struct Loader {
  Fasta* fa;
  std::vector<WindowSpec> windows;  // indexed by dataset idx
  int64_t seq_len;
  int batch_size;
  int mlm;
  double mlm_prob;
  int add_eos;
  int rc_aug;
  int64_t seed;
  int32_t vocab_size;

  // work queue: indices for the current batch request
  std::vector<int64_t> pending_idx;   // dataset indices (size batch)
  std::vector<int64_t> pending_item;  // item ordinal in batch
  int64_t epoch;
  size_t cursor;
  int32_t* out_x;
  int32_t* out_y;

  pthread_mutex_t mu;
  std::vector<pthread_t> threads;
  int n_threads;
  pthread_barrier_t start_barrier, done_barrier;
  bool shutdown;
};

static void* worker_main(void* arg) {
  Loader* ld = (Loader*)arg;
  for (;;) {
    pthread_barrier_wait(&ld->start_barrier);
    if (ld->shutdown) return nullptr;
    for (;;) {
      int64_t slot = -1, idx = -1;
      pthread_mutex_lock(&ld->mu);
      if (ld->cursor < ld->pending_idx.size()) {
        slot = (int64_t)ld->cursor;
        idx = ld->pending_idx[ld->cursor];
        ld->cursor++;
      }
      pthread_mutex_unlock(&ld->mu);
      if (slot < 0) break;
      const WindowSpec& w = ld->windows[idx];
      hg38_item(ld->fa, w.contig, w.start, w.end, ld->seed, ld->epoch, idx,
                ld->rc_aug, ld->mlm, ld->mlm_prob, ld->add_eos, ld->vocab_size,
                ld->out_x + slot * ld->seq_len, ld->out_y + slot * ld->seq_len);
    }
    pthread_barrier_wait(&ld->done_barrier);
  }
}

void* loader_create(void* fasta, const int32_t* contigs, const int64_t* starts,
                    const int64_t* ends, int64_t n_windows, int64_t seq_len,
                    int batch_size, int mlm, double mlm_prob, int add_eos,
                    int rc_aug, int64_t seed, int32_t vocab_size,
                    int n_threads) {
  Loader* ld = new Loader();
  ld->fa = (Fasta*)fasta;
  ld->windows.resize(n_windows);
  for (int64_t i = 0; i < n_windows; i++)
    ld->windows[i] = {contigs[i], starts[i], ends[i]};
  ld->seq_len = seq_len;
  ld->batch_size = batch_size;
  ld->mlm = mlm;
  ld->mlm_prob = mlm_prob;
  ld->add_eos = add_eos;
  ld->rc_aug = rc_aug;
  ld->seed = seed;
  ld->vocab_size = vocab_size;
  ld->shutdown = false;
  ld->n_threads = n_threads > 0 ? n_threads : 4;
  pthread_mutex_init(&ld->mu, nullptr);
  pthread_barrier_init(&ld->start_barrier, nullptr, ld->n_threads + 1);
  pthread_barrier_init(&ld->done_barrier, nullptr, ld->n_threads + 1);
  ld->threads.resize(ld->n_threads);
  for (int i = 0; i < ld->n_threads; i++)
    pthread_create(&ld->threads[i], nullptr, worker_main, ld);
  return ld;
}

// Fill a batch for the given dataset indices; parallel across items.
void loader_fill_batch(void* h, const int64_t* indices, int n, int64_t epoch,
                       int32_t* out_x, int32_t* out_y) {
  Loader* ld = (Loader*)h;
  ld->pending_idx.assign(indices, indices + n);
  ld->epoch = epoch;
  ld->cursor = 0;
  ld->out_x = out_x;
  ld->out_y = out_y;
  pthread_barrier_wait(&ld->start_barrier);  // release workers
  pthread_barrier_wait(&ld->done_barrier);   // wait for completion
}

void loader_destroy(void* h) {
  Loader* ld = (Loader*)h;
  ld->shutdown = true;
  pthread_barrier_wait(&ld->start_barrier);
  for (auto& t : ld->threads) pthread_join(t, nullptr);
  pthread_barrier_destroy(&ld->start_barrier);
  pthread_barrier_destroy(&ld->done_barrier);
  pthread_mutex_destroy(&ld->mu);
  delete ld;
}

}  // extern "C"

// Serial (single-process) MPI stub — just enough of the MPI-2 surface to
// build and run the reference Saena library at nprocs == 1, so its true
// iteration counts can be recorded as goldens (VERDICT r3 #2).
//
// Semantics at one rank:
//   - collectives degenerate to memcpy (a 1-contribution allreduce is the
//     identity regardless of op);
//   - point-to-point becomes self-messaging through an in-process queue,
//     matched by tag in FIFO order at Wait/Test time (rank 0 <-> rank 0);
//   - datatypes are represented by their byte size (MPI_Type_contiguous
//     multiplies sizes); MPI_File maps to stdio with explicit offsets.
//
// This models exactly what a conforming MPI would do with one process —
// no Saena algorithm is altered.
#ifndef SAENA_SERIAL_MPI_STUB_H
#define SAENA_SERIAL_MPI_STUB_H

#include <cstdint>
#include <climits>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <sys/time.h>
#include <vector>

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Op;
typedef int MPI_Info;
typedef long long MPI_Offset;
typedef long MPI_Aint;
// datatype value == byte size of one element
typedef int MPI_Datatype;

#define MPI_COMM_WORLD 1
#define MPI_COMM_SELF  2
#define MPI_COMM_NULL  0
#define MPI_GROUP_NULL 0
#define MPI_INFO_NULL  0
#define MPI_SUCCESS    0
#define MPI_ERR_OTHER  1
#define MPI_UNDEFINED  (-32766)
#define MPI_ANY_TAG    (-1)
#define MPI_ANY_SOURCE (-2)

#define MPI_CHAR            ((MPI_Datatype)sizeof(char))
#define MPI_BYTE            ((MPI_Datatype)1)
#define MPI_SHORT           ((MPI_Datatype)sizeof(short))
#define MPI_INT             ((MPI_Datatype)sizeof(int))
#define MPI_LONG            ((MPI_Datatype)sizeof(long))
#define MPI_LONG_LONG_INT   ((MPI_Datatype)sizeof(long long))
#define MPI_UNSIGNED_CHAR   ((MPI_Datatype)sizeof(unsigned char))
#define MPI_UNSIGNED_SHORT  ((MPI_Datatype)sizeof(unsigned short))
#define MPI_UNSIGNED        ((MPI_Datatype)sizeof(unsigned))
#define MPI_UNSIGNED_LONG   ((MPI_Datatype)sizeof(unsigned long))
#define MPI_FLOAT           ((MPI_Datatype)sizeof(float))
#define MPI_DOUBLE          ((MPI_Datatype)sizeof(double))
#define MPI_LONG_DOUBLE     ((MPI_Datatype)sizeof(long double))
#define MPI_CXX_BOOL        ((MPI_Datatype)sizeof(bool))
// pair types (used only as markers by usort MINLOC/MAXLOC paths)
#define MPI_FLOAT_INT        ((MPI_Datatype)(sizeof(float) + sizeof(int)))
#define MPI_DOUBLE_INT       ((MPI_Datatype)(sizeof(double) + sizeof(int)))
#define MPI_LONG_INT         ((MPI_Datatype)(sizeof(long) + sizeof(int)))
#define MPI_SHORT_INT        ((MPI_Datatype)(sizeof(short) + sizeof(int)))
#define MPI_LONG_DOUBLE_INT  ((MPI_Datatype)(sizeof(long double) + sizeof(int)))
#define MPI_2INT             ((MPI_Datatype)(2 * sizeof(int)))

// ops: identity at one rank, value only distinguishes them
#define MPI_SUM  1
#define MPI_MAX  2
#define MPI_MIN  3
#define MPI_LOR  4
#define MPI_LAND 5
#define MPI_BOR  6
#define MPI_PROD 7
#define MPI_MAXLOC 8
#define MPI_MINLOC 9
#define MPI_OP_NULL 0

#define MPI_MODE_RDONLY 2
#define MPI_MODE_CREATE 4
#define MPI_MODE_WRONLY 8

#define MPI_IN_PLACE ((void *)(-1))

typedef struct MPI_Status {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
    long _bytes;   // received byte count for MPI_Get_count
} MPI_Status;

#define MPI_STATUS_IGNORE   ((MPI_Status *)nullptr)
#define MPI_STATUSES_IGNORE ((MPI_Status *)nullptr)

// ---- in-process self-messaging ----
struct saena_stub_req {
    bool is_recv = false;
    bool done = true;
    void *buf = nullptr;
    long max_bytes = 0;
    int tag = 0;
    long got_bytes = 0;
};
typedef saena_stub_req *MPI_Request;
#define MPI_REQUEST_NULL ((MPI_Request)nullptr)

struct saena_stub_msg {
    std::vector<unsigned char> data;
    int tag;
};

inline std::deque<saena_stub_msg> &saena_stub_queue() {
    static std::deque<saena_stub_msg> q;
    return q;
}

inline std::deque<saena_stub_req *> &saena_stub_pending_recvs() {
    static std::deque<saena_stub_req *> q;
    return q;
}

inline void saena_stub_match() {
    // FIFO matching of queued self-sends against pending receives by tag
    auto &recvs = saena_stub_pending_recvs();
    auto &msgs = saena_stub_queue();
    for (auto it = recvs.begin(); it != recvs.end();) {
        saena_stub_req *r = *it;
        bool matched = false;
        for (auto mit = msgs.begin(); mit != msgs.end(); ++mit) {
            if (r->tag == MPI_ANY_TAG || r->tag == mit->tag) {
                long n = (long)mit->data.size();
                if (n > r->max_bytes) n = r->max_bytes;
                if (n > 0) std::memcpy(r->buf, mit->data.data(), (size_t)n);
                r->got_bytes = n;
                r->done = true;
                msgs.erase(mit);
                matched = true;
                break;
            }
        }
        if (matched) it = recvs.erase(it);
        else ++it;
    }
}

// ---- environment ----
inline int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
inline int MPI_Init_thread(int *, char ***, int, int *p) { if (p) *p = 0; return MPI_SUCCESS; }
inline int MPI_Finalize() { return MPI_SUCCESS; }
inline int MPI_Initialized(int *f) { if (f) *f = 1; return MPI_SUCCESS; }
inline int MPI_Abort(MPI_Comm, int code) { std::exit(code ? code : 1); }
inline int MPI_Pcontrol(int, ...) { return MPI_SUCCESS; }
inline double MPI_Wtime() {
    struct timeval tv;
    gettimeofday(&tv, nullptr);
    return (double)tv.tv_sec + 1e-6 * (double)tv.tv_usec;
}

// ---- communicators / groups ----
inline int MPI_Comm_size(MPI_Comm, int *s) { *s = 1; return MPI_SUCCESS; }
inline int MPI_Comm_rank(MPI_Comm, int *r) { *r = 0; return MPI_SUCCESS; }
inline int MPI_Comm_dup(MPI_Comm c, MPI_Comm *out) { *out = c; return MPI_SUCCESS; }
inline int MPI_Comm_free(MPI_Comm *c) { *c = MPI_COMM_NULL; return MPI_SUCCESS; }
inline int MPI_Comm_split(MPI_Comm c, int color, int, MPI_Comm *out) {
    *out = (color == MPI_UNDEFINED) ? MPI_COMM_NULL : c;
    return MPI_SUCCESS;
}
inline int MPI_Comm_group(MPI_Comm, MPI_Group *g) { *g = 1; return MPI_SUCCESS; }
inline int MPI_Group_incl(MPI_Group, int n, const int *, MPI_Group *out) {
    *out = n > 0 ? 1 : MPI_GROUP_NULL;
    return MPI_SUCCESS;
}
inline int MPI_Group_free(MPI_Group *g) { *g = MPI_GROUP_NULL; return MPI_SUCCESS; }
inline int MPI_Comm_create_group(MPI_Comm c, MPI_Group g, int, MPI_Comm *out) {
    *out = (g == MPI_GROUP_NULL) ? MPI_COMM_NULL : c;
    return MPI_SUCCESS;
}
inline int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }

// ---- datatypes ----
inline int MPI_Type_contiguous(int n, MPI_Datatype base, MPI_Datatype *out) {
    *out = n * base;
    return MPI_SUCCESS;
}
inline int MPI_Type_create_struct(int count, const int *bl, const MPI_Aint *,
                                  const MPI_Datatype *types, MPI_Datatype *out) {
    int sz = 0;
    for (int i = 0; i < count; ++i) sz += bl[i] * types[i];
    *out = sz;
    return MPI_SUCCESS;
}
inline int MPI_Type_commit(MPI_Datatype *) { return MPI_SUCCESS; }
inline int MPI_Type_free(MPI_Datatype *t) { *t = 0; return MPI_SUCCESS; }
inline int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count) {
    *count = (st && dt > 0) ? (int)(st->_bytes / dt) : 0;
    return MPI_SUCCESS;
}
inline int MPI_Op_create(void (*)(void *, void *, int *, MPI_Datatype *), int,
                         MPI_Op *op) { *op = 100; return MPI_SUCCESS; }
inline int MPI_Op_free(MPI_Op *op) { *op = MPI_OP_NULL; return MPI_SUCCESS; }

// ---- collectives (1 rank: identity / memcpy) ----
inline int saena_stub_copy(const void *src, void *dst, long bytes) {
    if (src != dst && src != MPI_IN_PLACE && bytes > 0)
        std::memcpy(dst, src, (size_t)bytes);
    return MPI_SUCCESS;
}
inline int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype dt,
                         MPI_Op, MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * dt);
}
inline int MPI_Reduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op,
                      int, MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * dt);
}
inline int MPI_Scan(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op,
                    MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * dt);
}
inline int MPI_Exscan(const void *, void *r, int n, MPI_Datatype dt, MPI_Op,
                      MPI_Comm) {
    if (n > 0) std::memset(r, 0, (size_t)n * dt);
    return MPI_SUCCESS;
}
inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_SUCCESS;
}
inline int MPI_Allgather(const void *s, int n, MPI_Datatype sdt, void *r,
                         int, MPI_Datatype, MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * sdt);
}
inline int MPI_Gather(const void *s, int n, MPI_Datatype sdt, void *r, int,
                      MPI_Datatype, int, MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * sdt);
}
inline int MPI_Allgatherv(const void *s, int n, MPI_Datatype sdt, void *r,
                          const int *, const int *displs, MPI_Datatype rdt,
                          MPI_Comm) {
    return saena_stub_copy(
        s, (char *)r + (displs ? (long)displs[0] * rdt : 0), (long)n * sdt);
}
inline int MPI_Alltoall(const void *s, int n, MPI_Datatype sdt, void *r, int,
                        MPI_Datatype, MPI_Comm) {
    return saena_stub_copy(s, r, (long)n * sdt);
}
inline int MPI_Alltoallv(const void *s, const int *scnt, const int *sdsp,
                         MPI_Datatype sdt, void *r, const int *rcnt,
                         const int *rdsp, MPI_Datatype rdt, MPI_Comm) {
    long bytes = (long)scnt[0] * sdt;
    long rb = (long)rcnt[0] * rdt;
    if (rb < bytes) bytes = rb;
    return saena_stub_copy((const char *)s + (long)sdsp[0] * sdt,
                           (char *)r + (long)rdsp[0] * rdt, bytes);
}

// ---- point-to-point (self-messaging) ----
inline int MPI_Isend(const void *buf, int n, MPI_Datatype dt, int, int tag,
                     MPI_Comm, MPI_Request *req) {
    saena_stub_msg m;
    m.tag = tag;
    m.data.assign((const unsigned char *)buf,
                  (const unsigned char *)buf + (long)n * dt);
    saena_stub_queue().push_back(std::move(m));
    saena_stub_match();
    auto *r = new saena_stub_req();
    r->done = true;
    *req = r;
    return MPI_SUCCESS;
}
inline int MPI_Issend(const void *buf, int n, MPI_Datatype dt, int d, int tag,
                      MPI_Comm c, MPI_Request *req) {
    return MPI_Isend(buf, n, dt, d, tag, c, req);
}
inline int MPI_Irecv(void *buf, int n, MPI_Datatype dt, int, int tag,
                     MPI_Comm, MPI_Request *req) {
    auto *r = new saena_stub_req();
    r->is_recv = true;
    r->done = false;
    r->buf = buf;
    r->max_bytes = (long)n * dt;
    r->tag = tag;
    saena_stub_pending_recvs().push_back(r);
    saena_stub_match();
    *req = r;
    return MPI_SUCCESS;
}
inline int MPI_Send(const void *buf, int n, MPI_Datatype dt, int d, int tag,
                    MPI_Comm c) {
    MPI_Request r;
    MPI_Isend(buf, n, dt, d, tag, c, &r);
    delete r;
    return MPI_SUCCESS;
}
inline int MPI_Recv(void *buf, int n, MPI_Datatype dt, int, int tag, MPI_Comm,
                    MPI_Status *st) {
    auto *r = new saena_stub_req();
    r->is_recv = true;
    r->done = false;
    r->buf = buf;
    r->max_bytes = (long)n * dt;
    r->tag = tag;
    saena_stub_pending_recvs().push_back(r);
    saena_stub_match();
    if (!r->done) {
        std::fprintf(stderr,
                     "mpi stub: blocking Recv with no matching self-send "
                     "(tag %d) — would deadlock\n", tag);
        std::exit(13);
    }
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = tag; st->_bytes = r->got_bytes; }
    delete r;
    return MPI_SUCCESS;
}
inline int MPI_Sendrecv(const void *sbuf, int sn, MPI_Datatype sdt, int, int,
                        void *rbuf, int rn, MPI_Datatype rdt, int, int,
                        MPI_Comm, MPI_Status *st) {
    long bytes = (long)sn * sdt;
    long rb = (long)rn * rdt;
    if (rb < bytes) bytes = rb;
    saena_stub_copy(sbuf, rbuf, bytes);
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = 0; st->_bytes = bytes; }
    return MPI_SUCCESS;
}
inline int MPI_Wait(MPI_Request *req, MPI_Status *st) {
    saena_stub_match();
    saena_stub_req *r = *req;
    if (r) {
        if (!r->done) {
            std::fprintf(stderr, "mpi stub: Wait on unmatched recv (tag %d) "
                                 "— would deadlock\n", r->tag);
            std::exit(13);
        }
        if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = r->tag; st->_bytes = r->got_bytes; }
        delete r;
        *req = MPI_REQUEST_NULL;
    }
    return MPI_SUCCESS;
}
inline int MPI_Test(MPI_Request *req, int *flag, MPI_Status *st) {
    saena_stub_match();
    saena_stub_req *r = *req;
    if (!r) { *flag = 1; return MPI_SUCCESS; }
    *flag = r->done ? 1 : 0;
    if (r->done) {
        if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = r->tag; st->_bytes = r->got_bytes; }
        delete r;
        *req = MPI_REQUEST_NULL;
    }
    return MPI_SUCCESS;
}
inline int MPI_Waitall(int n, MPI_Request *reqs, MPI_Status *sts) {
    for (int i = 0; i < n; ++i)
        MPI_Wait(&reqs[i], sts ? &sts[i] : MPI_STATUS_IGNORE);
    return MPI_SUCCESS;
}
inline int MPI_Waitany(int n, MPI_Request *reqs, int *index, MPI_Status *st) {
    saena_stub_match();
    for (int i = 0; i < n; ++i) {
        if (reqs[i] && reqs[i]->done) {
            *index = i;
            return MPI_Wait(&reqs[i], st);
        }
    }
    *index = MPI_UNDEFINED;
    return MPI_SUCCESS;
}


// ---- one-sided + memory (usort parUtils.cpp) ----
typedef int MPI_Win;
#define MPI_WIN_NULL 0
#define MPI_MODE_NOPRECEDE 1
#define MPI_MODE_NOSTORE   2
#define MPI_MODE_NOSUCCEED 4
#define MPI_MODE_NOPUT     8
inline int MPI_Alloc_mem(MPI_Aint size, MPI_Info, void *baseptr) {
    *(void **)baseptr = malloc((size_t)(size > 0 ? size : 1));
    return MPI_SUCCESS;
}
inline int MPI_Free_mem(void *base) { free(base); return MPI_SUCCESS; }
inline int MPI_Comm_create(MPI_Comm c, MPI_Group g, MPI_Comm *out) {
    *out = (g == MPI_GROUP_NULL) ? MPI_COMM_NULL : c;
    return MPI_SUCCESS;
}
inline int MPI_Win_create(void *, MPI_Aint, int, MPI_Info, MPI_Comm,
                          MPI_Win *win) { *win = 1; return MPI_SUCCESS; }
inline int MPI_Win_fence(int, MPI_Win) { return MPI_SUCCESS; }
inline int MPI_Win_free(MPI_Win *win) { *win = MPI_WIN_NULL; return MPI_SUCCESS; }
inline int MPI_Put(const void *, int, MPI_Datatype, int, MPI_Aint, int,
                   MPI_Datatype, MPI_Win) {
    // self-put: usort uses Win only across ranks; at 1 rank the target
    // displacement addressing needs the window base, which this stub does
    // not track — but every usort call site guards with npes==1 early
    // exits, so a reaching Put indicates a logic change. Fail loudly.
    std::fprintf(stderr, "mpi stub: MPI_Put not supported at 1 rank\n");
    std::exit(13);
}

// ---- file I/O (stdio with explicit offsets) ----
typedef FILE *MPI_File;
inline int MPI_File_open(MPI_Comm, const char *name, int mode, MPI_Info,
                         MPI_File *fh) {
    *fh = std::fopen(name, (mode & MPI_MODE_RDONLY) ? "rb" : "wb");
    return *fh ? MPI_SUCCESS : MPI_ERR_OTHER;
}
inline int MPI_File_read_at(MPI_File fh, MPI_Offset off, void *buf, int n,
                            MPI_Datatype dt, MPI_Status *st) {
    std::fseek(fh, (long)off, SEEK_SET);
    size_t got = std::fread(buf, 1, (size_t)n * dt, fh);
    if (st) st->_bytes = (long)got;
    return MPI_SUCCESS;
}
inline int MPI_File_close(MPI_File *fh) {
    if (*fh) std::fclose(*fh);
    *fh = nullptr;
    return MPI_SUCCESS;
}

#endif  // SAENA_SERIAL_MPI_STUB_H

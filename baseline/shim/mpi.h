/* Single-rank MPI stub for building the reference gmrm as a measured CPU
 * baseline on an image that ships no MPI development headers.
 *
 * Implements exactly the MPI surface the reference uses (SURVEY.md C10:
 * Init/Finalize/Abort, Comm_rank/size, Barrier, Wtime, Allgather(v),
 * Allreduce, Bcast, Type_size, File_{open,close,delete,get_size,
 * read_at[_all],write_at[_all]}) with self-communicator semantics: one
 * rank, collectives degenerate to memcpy, MPI-IO maps to POSIX pread/pwrite.
 *
 * This is OUR code (no relation to any MPI implementation's headers); it
 * exists only under baseline/ to produce a real compiled-reference number.
 */
#ifndef GMRM_BASELINE_MPI_STUB_H
#define GMRM_BASELINE_MPI_STUB_H

#include <fcntl.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <time.h>
#include <unistd.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
typedef int MPI_Info;
typedef int MPI_Op;
typedef int MPI_File;            /* holds the POSIX fd directly */
typedef long long MPI_Offset;
/* Datatype handles are their byte sizes. */
typedef int MPI_Datatype;

typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR; } MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_INFO_NULL 0
#define MPI_SUCCESS 0
#define MPI_ERR_OTHER 1

#define MPI_CHAR ((MPI_Datatype)1)
#define MPI_UNSIGNED_CHAR ((MPI_Datatype)1)
#define MPI_C_BOOL ((MPI_Datatype)1)
#define MPI_INT ((MPI_Datatype)4)
#define MPI_UNSIGNED ((MPI_Datatype)4)
#define MPI_INTEGER ((MPI_Datatype)4)
#define MPI_DOUBLE ((MPI_Datatype)8)
#define MPI_UNSIGNED_LONG_LONG ((MPI_Datatype)8)

#define MPI_SUM ((MPI_Op)1)
#define MPI_MAX ((MPI_Op)2)

#define MPI_MODE_RDONLY 1
#define MPI_MODE_WRONLY 2
#define MPI_MODE_CREATE 4
#define MPI_MODE_EXCL 8

static inline int MPI_Init(int *argc, char ***argv) {
    (void)argc; (void)argv; return MPI_SUCCESS;
}
static inline int MPI_Finalize(void) { return MPI_SUCCESS; }
static inline int MPI_Abort(MPI_Comm comm, int code) {
    (void)comm; exit(code);
}
static inline int MPI_Comm_rank(MPI_Comm comm, int *rank) {
    (void)comm; *rank = 0; return MPI_SUCCESS;
}
static inline int MPI_Comm_size(MPI_Comm comm, int *size) {
    (void)comm; *size = 1; return MPI_SUCCESS;
}
static inline int MPI_Barrier(MPI_Comm comm) { (void)comm; return MPI_SUCCESS; }
static inline double MPI_Wtime(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}
static inline int MPI_Type_size(MPI_Datatype dt, int *size) {
    *size = (int)dt; return MPI_SUCCESS;
}

/* ---- collectives: single-rank semantics -------------------------------- */

static inline int MPI_Allgather(const void *send, int scount, MPI_Datatype st,
                                void *recv, int rcount, MPI_Datatype rt,
                                MPI_Comm comm) {
    (void)rcount; (void)rt; (void)comm;
    memcpy(recv, send, (size_t)scount * (size_t)st);
    return MPI_SUCCESS;
}
static inline int MPI_Allgatherv(const void *send, int scount, MPI_Datatype st,
                                 void *recv, const int *rcounts,
                                 const int *displs, MPI_Datatype rt,
                                 MPI_Comm comm) {
    (void)rcounts; (void)comm;
    memcpy((char *)recv + (size_t)displs[0] * (size_t)rt,
           send, (size_t)scount * (size_t)st);
    return MPI_SUCCESS;
}
static inline int MPI_Allreduce(const void *send, void *recv, int count,
                                MPI_Datatype dt, MPI_Op op, MPI_Comm comm) {
    (void)op; (void)comm;
    memcpy(recv, send, (size_t)count * (size_t)dt);
    return MPI_SUCCESS;
}
static inline int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root,
                            MPI_Comm comm) {
    (void)buf; (void)count; (void)dt; (void)root; (void)comm;
    return MPI_SUCCESS;
}

/* ---- MPI-IO -> POSIX ---------------------------------------------------- */

static inline int MPI_File_open(MPI_Comm comm, const char *path, int amode,
                                MPI_Info info, MPI_File *fh) {
    (void)comm; (void)info;
    int flags = 0;
    if (amode & MPI_MODE_RDONLY) flags |= O_RDONLY;
    if (amode & MPI_MODE_WRONLY) flags |= O_WRONLY;
    if (amode & MPI_MODE_CREATE) flags |= O_CREAT;
    if (amode & MPI_MODE_EXCL) flags |= O_EXCL;
    int fd = open(path, flags, 0644);
    if (fd < 0) return MPI_ERR_OTHER;
    *fh = fd;
    return MPI_SUCCESS;
}
static inline int MPI_File_close(MPI_File *fh) {
    int rc = close(*fh);
    *fh = -1;
    return rc == 0 ? MPI_SUCCESS : MPI_ERR_OTHER;
}
static inline int MPI_File_delete(const char *path, MPI_Info info) {
    (void)info;
    return unlink(path) == 0 ? MPI_SUCCESS : MPI_ERR_OTHER;
}
static inline int MPI_File_get_size(MPI_File fh, MPI_Offset *size) {
    struct stat st;
    if (fstat(fh, &st) != 0) return MPI_ERR_OTHER;
    *size = (MPI_Offset)st.st_size;
    return MPI_SUCCESS;
}
static inline int MPI_File_read_at(MPI_File fh, MPI_Offset off, void *buf,
                                   int count, MPI_Datatype dt,
                                   MPI_Status *status) {
    (void)status;
    size_t nbytes = (size_t)count * (size_t)dt;
    char *p = (char *)buf;
    while (nbytes > 0) {
        ssize_t r = pread(fh, p, nbytes, (off_t)off);
        if (r <= 0) return MPI_ERR_OTHER;
        p += r; off += r; nbytes -= (size_t)r;
    }
    return MPI_SUCCESS;
}
static inline int MPI_File_read_at_all(MPI_File fh, MPI_Offset off, void *buf,
                                       int count, MPI_Datatype dt,
                                       MPI_Status *status) {
    return MPI_File_read_at(fh, off, buf, count, dt, status);
}
static inline int MPI_File_write_at(MPI_File fh, MPI_Offset off,
                                    const void *buf, int count,
                                    MPI_Datatype dt, MPI_Status *status) {
    (void)status;
    size_t nbytes = (size_t)count * (size_t)dt;
    const char *p = (const char *)buf;
    while (nbytes > 0) {
        ssize_t r = pwrite(fh, p, nbytes, (off_t)off);
        if (r < 0) return MPI_ERR_OTHER;
        p += r; off += r; nbytes -= (size_t)r;
    }
    return MPI_SUCCESS;
}
static inline int MPI_File_write_at_all(MPI_File fh, MPI_Offset off,
                                        const void *buf, int count,
                                        MPI_Datatype dt, MPI_Status *status) {
    return MPI_File_write_at(fh, off, buf, count, dt, status);
}

#ifdef __cplusplus
}
#endif

#endif /* GMRM_BASELINE_MPI_STUB_H */

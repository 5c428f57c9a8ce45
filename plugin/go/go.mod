module github.com/lattisense/lattisense-tpu/plugin/go

go 1.21

// The core package has no external dependencies. The optional Lattigo
// bridge (build tag "lattigo") additionally needs:
//   go get github.com/tuneinsight/lattigo/v4

package svc

import (
	"fmt"
	"sync"
)

type TaskServer struct {
	mu    sync.Mutex
	tasks map[int]string
}

type Option struct {
	Addr string
}

type Store interface {
	Persist(rows []string) error
}

func NewTaskServer(opt Option) *TaskServer {
	return &TaskServer{tasks: map[int]string{}}
}

func (s *TaskServer) Add(title string) int {
	s.mu.Lock()
	defer s.mu.Unlock()
	id := len(s.tasks) + 1
	s.tasks[id] = title
	return id
}

func (s *TaskServer) String() string {
	return fmt.Sprintf("TaskServer(%d tasks)", len(s.tasks))
}

func validate(title string) error {
	if title == "" {
		return fmt.Errorf("empty title")
	}
	return nil
}

var logAll = func(lines []string) int {
	return persistAll(lines)
}
